"""RL policy network: MLP actor inference in pure JAX.

TPU-native replacement for the libtorch/TorchScript inference path
(src/go1_rl_ctrl_cpp/src/torch_eigen/TorchEigen.cpp:4-32). The actor is the
rsl_rl architecture used by the reference's debug harness
(src/pytorch_debug/rl_policy_module.py:17-29): obs 48 -> [512, 256, 128]
-> 12 with ELU activations. Parameters are a flat pytree; inference is a
chain of MXU matmuls that batches over environments for free.

``load_torchscript_actor`` converts the reference's .pt weight files (CPU
torch is available in this environment) into the JAX pytree, replacing the
TorchEigen load path.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

ACTOR_HIDDEN_DIMS = (512, 256, 128)
OBS_DIM = 48
ACTION_DIM = 12


class MLPParams(NamedTuple):
    weights: tuple  # tuple of (in, out) matrices
    biases: tuple   # tuple of (out,) vectors


def init_mlp(key, obs_dim=OBS_DIM, hidden=ACTOR_HIDDEN_DIMS,
             action_dim=ACTION_DIM, dtype=jnp.float32):
    """Orthogonal-ish (scaled normal) init matching rsl_rl defaults."""
    dims = (obs_dim,) + tuple(hidden) + (action_dim,)
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / dims[i]).astype(dtype)
        ws.append(jax.random.normal(sub, (dims[i], dims[i + 1]),
                                    dtype) * scale)
        bs.append(jnp.zeros((dims[i + 1],), dtype))
    return MLPParams(weights=tuple(ws), biases=tuple(bs))


def mlp_apply(params, obs):
    """Actor forward pass: ELU hidden layers, linear output.

    Args:
      params: MLPParams.
      obs: (..., obs_dim).

    Returns:
      (..., action_dim) unclipped actions.
    """
    x = obs
    n = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        x = x @ w + b
        if i < n - 1:
            x = jax.nn.elu(x)
    return x


def load_torchscript_actor(path, dtype=jnp.float32):
    """Convert a TorchScript actor .pt (the reference's resource files,
    Go1RLController.cpp:66-76) into MLPParams.

    Walks the scripted module's parameters in order and pairs them as
    (weight, bias) per Linear layer. Torch stores Linear weights as
    (out, in); transposed here for x @ W.
    """
    import torch
    module = torch.jit.load(path, map_location="cpu")
    module.eval()
    tensors = [p.detach().cpu().numpy() for p in module.parameters()]
    ws, bs = [], []
    for t in tensors:
        if t.ndim == 2:
            ws.append(jnp.asarray(t.T, dtype))
        elif t.ndim == 1:
            bs.append(jnp.asarray(t, dtype))
    if len(ws) != len(bs):
        raise ValueError(
            f"unpaired weights/biases in {path}: {len(ws)} vs {len(bs)}")
    return MLPParams(weights=tuple(ws), biases=tuple(bs))
