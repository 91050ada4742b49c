from . import block_sparse, mesh, sharded_cov  # noqa: F401
