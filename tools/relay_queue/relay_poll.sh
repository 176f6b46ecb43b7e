#!/bin/bash
# Poll relay health; touch /tmp/relay_up when a tiny matmul completes.
rm -f /tmp/relay_up
for i in $(seq 1 1440); do  # up to 12h, every 30s
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((64,64)); (x@x).block_until_ready()
" >/dev/null 2>&1; then
    touch /tmp/relay_up
    echo "relay up at $(date)" >> /tmp/relay_poll.log
    exit 0
  fi
  sleep 30
done
