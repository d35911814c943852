"""torbi_tpu: a TPU-native Viterbi decoding framework.

Brand-new JAX/XLA/Pallas implementation with the full capability surface of
the reference torbi package (see SURVEY.md): batched decoding of
time-varying categorical distributions, file and file-batch APIs, a CLI,
entropy-based chunking of long sequences, multi-chip scale-out via
jax.sharding, and a pitch-posteriorgram evaluation harness.
"""

###############################################################################
# Configuration
###############################################################################


# Default configuration parameters to be modified
from .config import defaults

# Modify configuration (yapecs-style --config composition,
# reference torbi/__init__.py:7-17)
from .config.core import configure
configure('torbi_tpu', defaults)

# Import configuration parameters
from .config.defaults import *
import sys as _sys
_self = _sys.modules[__name__]
if hasattr(_self, 'defaults'):
    del _self.defaults  # remove unnecessary module (reference parity)
from .config.static import *


###############################################################################
# Compilation cache
###############################################################################


# The Pallas kernels statically unroll the band recursion, so first compiles
# are expensive; the persistent cache amortizes them across processes (the
# reference amortizes native builds via prebuilt fat wheels instead,
# /root/reference/setup.py:110-115)
def _enable_compilation_cache():
    import os
    import jax
    try:
        # Respect an existing user configuration (env var or jax.config)
        if os.environ.get('JAX_COMPILATION_CACHE_DIR'):
            return
        if getattr(jax.config, 'jax_compilation_cache_dir', None):
            return
        path = os.environ.get(
            'TORBI_TPU_COMPILATION_CACHE',
            os.path.join(
                os.path.expanduser('~'), '.cache', 'torbi_tpu', 'xla'))
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # Persist even sub-second compiles ONLY on platforms that compile
        # through a remote hop (~1s per tiny op program on a fresh process);
        # elsewhere keep the JAX default so unrelated JAX programs in the
        # same process don't bloat the on-disk cache
        platforms = os.environ.get('JAX_PLATFORMS', '')
        if 'axon' in platforms or os.environ.get('TORBI_TPU_PERSIST_ALL'):
            jax.config.update(
                'jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:
        pass  # cache is an optimization only


_enable_compilation_cache()


###############################################################################
# Module imports
###############################################################################

from .viterbi import decode
from .core import (
    from_probabilities,
    from_file,
    from_file_to_file,
    from_files_to_files,
    from_dataloader,
    save,
    save_masked,
)
from .chunk import chunk
from .ops.dispatch import pack_observation
from . import data
from . import evaluate
from . import models
from . import ops
from . import parallel
from . import partition
from . import reference
from . import utils

__version__ = '0.1.0'
