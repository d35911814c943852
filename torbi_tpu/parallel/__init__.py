from . import files
from . import mesh
from .mesh import batch_mesh, initialize_distributed
from .sharded import decode_sharded
from .timesharded import decode_time_sharded
