#!/usr/bin/env python
"""Relay-health canary for the axon TPU tunnel.

Escalates through exactly the operations the bench needs, exiting
non-zero at the first failure: (1) tiny jit + scalar d2h fetch, (2)
medium on-device generation + reduce + scalar fetch. A passing probe
means compile, execution AND device->host transfers are all live --
the relay's partial-wedge mode (execution works, every d2h fails
UNIMPLEMENTED) is caught by the float() fetches here, not by the first
big bench job.

Run it via tools/tpu_attempt.sh, never two TPU clients at once, and
never under a short SIGKILL timeout (killing a client mid-claim wedges
the relay for its grant timeout, ~10-30 min). An apparent hang often
resolves in-process within ~7-8 minutes; be patient.

With --idle, runs the claim-lifetime diagnostic instead: tiny fetches
at growing idle intervals, reporting WHEN (seconds after claim) the d2h
path dies.  Motivated by 2026-08-21 telemetry: two bench runs wedged at
different ladder steps but at similar wall times after the claim
(~3-7 min, spanning the remote compile), pointing at a lease/keepalive
failure rather than an operation-size trigger.
"""
import time
import sys

t0 = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("devices:", jax.devices(), flush=True)
r = jax.jit(lambda v: (v * 2 + 1).sum())(jnp.arange(8.0))
print(f"tiny fetch: {float(r)} ({time.time()-t0:.0f}s)", flush=True)
assert float(r) == 64.0

if "--idle" in sys.argv:
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.float32(1.0)
    for wait_s in (30, 60, 120, 180, 240):
        time.sleep(wait_s)
        try:
            v = float(f(x))
            print(f"idle {wait_s}s -> fetch ok ({time.time()-t0:.0f}s "
                  "after claim)", flush=True)
        except Exception as e:
            print(f"idle {wait_s}s -> fetch FAILED at "
                  f"{time.time()-t0:.0f}s after claim: "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)
            sys.exit(1)
    print("IDLE_PROBE_OK", flush=True)
    sys.exit(0)


def g():
    # PRNGKey INSIDE jit: eager key construction is rejected by the
    # relay's degraded states (see bench.py noise_iq)
    key = jax.random.PRNGKey(0)
    return jnp.abs(jax.random.normal(key, (4_000_000,), jnp.float32)).sum()


r2 = jax.jit(g)()
v2 = float(r2)
print(f"medium fetch: {v2:.1f} ({time.time()-t0:.0f}s)", flush=True)
assert 2_500_000 < v2 < 4_000_000  # E|N(0,1)| ~ 0.8 per sample
print("PROBE_OK", flush=True)
sys.exit(0)
