from .base import Strategy
from .default import DefaultStrategy
from .mcmc import MCMCStrategy
from . import ops

__all__ = ["Strategy", "DefaultStrategy", "MCMCStrategy", "ops"]
