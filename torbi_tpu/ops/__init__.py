from . import associative
from . import band
from . import lse
from . import oracle
from . import scan
from .dispatch import decode, resolve_backend
