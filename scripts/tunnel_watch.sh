#!/bin/bash
# Poll until the axon TPU tunnel answers a device op, then exit 0.
# Each probe is bounded; a hung import means tunnel down.
while true; do
  if timeout 75 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform == 'tpu', d
print(int(jnp.ones((8,8)).sum()))
" >/dev/null 2>&1; then
    echo "TUNNEL UP $(date -u +%FT%TZ)"
    exit 0
  fi
  sleep 120
done
