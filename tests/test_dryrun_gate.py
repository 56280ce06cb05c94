"""The dryrun gate must be immune to TPU-tunnel state.

MULTICHIP_r04 failed because the tunnel's backend LISTED devices fine but
raised FAILED_PRECONDITION on data movement (libtpu client/terminal version
mismatch), so a listing-based liveness probe kept the backend and a later
`device_put` engaged it and died. The fix (`_pin_cpu_platform`) drops the
tunneled backend factory unconditionally before any device query — a backend
that is never initialized cannot fail, whatever its health.
"""

import numpy as np


def test_pin_cpu_drops_backend_that_lists_but_cannot_move_data():
    # Simulate the r4 failure mode: an 'axon' factory is registered (as the
    # ambient sitecustomize does). Whether its backend would list devices or
    # explode on device_put must be IRRELEVANT after the pin — use a sentinel
    # that blows up if jax ever tries to build the backend from it.
    import jax
    from jax._src import xla_bridge as xb

    import __graft_entry__ as ge

    had_axon = "axon" in xb._backend_factories
    saved = xb._backend_factories.get("axon")
    xb._backend_factories["axon"] = object()  # poisoned: unusable if touched
    try:
        ge._pin_cpu_platform()
        assert "axon" not in xb._backend_factories
        assert jax.config.jax_platforms == "cpu"
        # Data movement and compute still work on the pinned CPU platform.
        x = jax.device_put(np.ones(4, np.float32))
        assert float(x.sum()) == 4.0
        assert jax.default_backend() == "cpu"
    finally:
        if had_axon:
            xb._backend_factories["axon"] = saved


def test_dryrun_device_pool_is_cpu_after_pin():
    import __graft_entry__ as ge

    ge._pin_cpu_platform()
    devices = ge._dryrun_devices(8)
    assert len(devices) == 8
    assert all(d.platform == "cpu" for d in devices)
