from . import band
from . import oracle
from . import scan
from .dispatch import decode, resolve_backend
