from . import dense, krylov, slq  # noqa: F401
