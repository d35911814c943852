from . import convert
from . import io
from . import progress
from . import timing as time
from .convert import to_jax, to_numpy
