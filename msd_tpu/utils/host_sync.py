"""Host-sync helpers for high-latency device links.

Through the axon relay, each device->host array fetch pays a full RPC
round trip — fetching an epoch's worth of per-step scalar metrics as
individual buffers costs hundreds of ms (measured: 60 loose scalars
~27 s worst case, vs 28 ms for one packed array). These helpers stack
scalar pytrees into ONE device array with a single cached jitted program
and fetch it in a single transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PACK_FNS: dict = {}


def fetch_metrics_packed(metrics_list):
    """[{name: scalar_device_array}] -> [{name: float}] via one fetch.

    All dicts must share the same key set (true for per-step metrics from
    one jitted step). Non-scalar leaves are not supported.
    """
    if not metrics_list:
        return []
    keys = tuple(sorted(metrics_list[0]))
    n = len(metrics_list)
    sig = (keys, n)
    fn = _PACK_FNS.get(sig)
    if fn is None:
        def pack(flat):
            return jnp.stack([jnp.float32(x) for x in flat]).reshape(n, len(keys))

        fn = jax.jit(pack)
        _PACK_FNS[sig] = fn
    flat = [m[k] for m in metrics_list for k in keys]
    vals = np.asarray(fn(flat))
    return [
        {k: float(vals[i, j]) for j, k in enumerate(keys)} for i in range(n)
    ]
