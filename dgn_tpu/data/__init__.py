from .loader import BatchLoader
from . import synthetic
