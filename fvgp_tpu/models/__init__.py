from .gp import GP  # noqa: F401
from .fvgp import fvGP  # noqa: F401
from .gp_mcmc import gpMCMC, ProposalDistribution  # noqa: F401
