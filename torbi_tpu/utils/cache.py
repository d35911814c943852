"""Identity-keyed caching for live immutable jax arrays.

jax arrays are immutable, so (id, shape) plus a liveness proof identifies
content; numpy/torch inputs are mutable and must NEVER be cached this way
(an in-place mutation would silently serve stale results).
"""
import weakref

import jax


def identity_cached(cache, array, compute, extra_key=()):
    """Cache ``compute()`` per live immutable jax array.

    The stored weakref (or a strong closure when weakrefs are unsupported)
    proves the id was not recycled. Mutable inputs bypass the cache.
    """
    if not isinstance(array, jax.Array):
        return compute()
    cache_key = (id(array), tuple(array.shape), extra_key)
    if cache_key in cache:
        result, ref = cache[cache_key]
        if ref() is array:
            return result
        del cache[cache_key]
    result = compute()
    if len(cache) > 64:
        cache.clear()
    try:
        ref = weakref.ref(array)
    except TypeError:
        ref = lambda: array
    cache[cache_key] = (result, ref)
    return result
