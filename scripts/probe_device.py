#!/usr/bin/env python3
"""Cheap tunnel-health probe: one trivial jit dispatch + fetch.

Exit 0 with a latency line when the device link is healthy; hang (caller
should wrap in `timeout`) when the tunnel is wedged. Used to gate expensive
bench/verify runs in bad link weather.
"""
import sys
import time

t0 = time.time()
import jax
import jax.numpy as jnp

t_import = time.time() - t0

t0 = time.time()
y = jax.jit(lambda a: a * 2 + 1)(jnp.arange(64))
val = int(y.sum())
t_op = time.time() - t0
print(
    f"probe ok backend={jax.default_backend()} import={t_import:.1f}s "
    f"first_op={t_op:.1f}s checksum={val}"
)
sys.exit(0)
