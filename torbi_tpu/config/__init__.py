from . import defaults
from .core import configure, ArgumentParser
