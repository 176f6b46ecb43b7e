"""Loss metrics: train MSE / eval MAE (reference loss_metric fields in every
shipped checkpoint: {'train': 'MSE', 'test': 'MAE'})."""

import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


LOSSES = {"MSE": mse, "MAE": mae, "L1": mae, "L2": mse}
