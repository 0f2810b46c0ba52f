"""Convert reference torch checkpoints (model-*.pt) into flax param pytrees.

The reference ships EMA weights inside ``model-best.pt`` under the "ema" key
(trainer.py:181-206, loaded at sample.py:157-167, state-dict layout from
ema-pytorch: ``ema_model.model.<graph-transformer parameters>`` plus DDPM
buffers). This module maps those tensors onto this framework's
GraphTransformer parameter tree:

torch key (inside ema_model.model.)                 -> flax path
---------------------------------------------------   -----------------------------------
node_embedding.{weight,bias}                          node_embedding.{kernel^T,bias}
edge_embedding.{weight,bias}                          edge_embedding.{kernel^T,bias}
node_decoder.{weight,bias}                            node_decoder.{kernel^T,bias}
graphtransformer.layers.{i}.0.0.norm.{weight,bias}    layers_{i}_attn_norm.{scale,bias}
graphtransformer.layers.{i}.0.0.fn.to_q.*             layers_{i}_attn.to_q.*
graphtransformer.layers.{i}.0.0.fn.to_kv.*            layers_{i}_attn.to_kv.*
graphtransformer.layers.{i}.0.0.fn.edges_to_kv.*      layers_{i}_attn.edges_to_kv_{kernel,bias}
graphtransformer.layers.{i}.0.0.fn.to_out.*           layers_{i}_attn.to_out.*
graphtransformer.layers.{i}.0.1.proj.0.weight         layers_{i}_attn_res.proj.kernel^T
graphtransformer.layers.{i}.1.0.norm.{weight,bias}    layers_{i}_ff_norm.{scale,bias}
graphtransformer.layers.{i}.1.0.fn.0.*                layers_{i}_ff.fc1.*
graphtransformer.layers.{i}.1.0.fn.2.*                layers_{i}_ff.fc2.*
graphtransformer.layers.{i}.1.1.proj.0.weight         layers_{i}_ff_res.proj.kernel^T

torch Linear stores (out, in); flax Dense stores (in, out) — all kernels are
transposed. DDPM buffers (betas, alphas_cumprod, ...) are NOT converted: this
framework recomputes them in float64 from the config.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _strip_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reduce an EMA / DDPM / bare state dict to graph-transformer keys."""
    for prefix in ("ema_model.model.", "model.", ""):
        sub = {
            k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)
        }
        if any(k.startswith("node_embedding.") for k in sub):
            return {k: v for k, v in sub.items() if "." in k}
    raise ValueError("state dict does not contain graph-transformer parameters")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def torch_state_dict_to_params(state: Dict[str, np.ndarray], n_layers: int) -> dict:
    """Map a torch GraphTransformer state dict to a flax param dict."""
    s = {k: _np(v) for k, v in _strip_prefix(state).items()}

    def dense(key):
        return {"kernel": s[f"{key}.weight"].T, "bias": s[f"{key}.bias"]}

    def norm(key):
        return {"scale": s[f"{key}.weight"], "bias": s[f"{key}.bias"]}

    params = {
        "node_embedding": dense("node_embedding"),
        "edge_embedding": dense("edge_embedding"),
        "node_decoder": dense("node_decoder"),
    }
    for i in range(n_layers):
        base = f"graphtransformer.layers.{i}"
        params[f"layers_{i}_attn_norm"] = norm(f"{base}.0.0.norm")
        params[f"layers_{i}_attn"] = {
            "to_q": dense(f"{base}.0.0.fn.to_q"),
            "to_kv": dense(f"{base}.0.0.fn.to_kv"),
            "to_out": dense(f"{base}.0.0.fn.to_out"),
            "edges_to_kv_kernel": s[f"{base}.0.0.fn.edges_to_kv.weight"].T,
            "edges_to_kv_bias": s[f"{base}.0.0.fn.edges_to_kv.bias"],
        }
        params[f"layers_{i}_attn_res"] = {
            "proj": {"kernel": s[f"{base}.0.1.proj.0.weight"].T}
        }
        params[f"layers_{i}_ff_norm"] = norm(f"{base}.1.0.norm")
        params[f"layers_{i}_ff"] = {
            "fc1": dense(f"{base}.1.0.fn.0"),
            "fc2": dense(f"{base}.1.0.fn.2"),
        }
        params[f"layers_{i}_ff_res"] = {
            "proj": {"kernel": s[f"{base}.1.1.proj.0.weight"].T}
        }
    return params


def params_to_torch_state_dict(params: dict, n_layers: int) -> Dict[str, np.ndarray]:
    """Inverse mapping (for exporting to reference-format checkpoints)."""
    out: Dict[str, np.ndarray] = {}

    def put_dense(key, p):
        out[f"{key}.weight"] = np.asarray(p["kernel"]).T
        out[f"{key}.bias"] = np.asarray(p["bias"])

    def put_norm(key, p):
        out[f"{key}.weight"] = np.asarray(p["scale"])
        out[f"{key}.bias"] = np.asarray(p["bias"])

    put_dense("node_embedding", params["node_embedding"])
    put_dense("edge_embedding", params["edge_embedding"])
    put_dense("node_decoder", params["node_decoder"])
    for i in range(n_layers):
        base = f"graphtransformer.layers.{i}"
        put_norm(f"{base}.0.0.norm", params[f"layers_{i}_attn_norm"])
        attn = params[f"layers_{i}_attn"]
        put_dense(f"{base}.0.0.fn.to_q", attn["to_q"])
        put_dense(f"{base}.0.0.fn.to_kv", attn["to_kv"])
        put_dense(f"{base}.0.0.fn.to_out", attn["to_out"])
        out[f"{base}.0.0.fn.edges_to_kv.weight"] = np.asarray(attn["edges_to_kv_kernel"]).T
        out[f"{base}.0.0.fn.edges_to_kv.bias"] = np.asarray(attn["edges_to_kv_bias"])
        out[f"{base}.0.1.proj.0.weight"] = np.asarray(
            params[f"layers_{i}_attn_res"]["proj"]["kernel"]
        ).T
        put_norm(f"{base}.1.0.norm", params[f"layers_{i}_ff_norm"])
        put_dense(f"{base}.1.0.fn.0", params[f"layers_{i}_ff"]["fc1"])
        put_dense(f"{base}.1.0.fn.2", params[f"layers_{i}_ff"]["fc2"])
        out[f"{base}.1.1.proj.0.weight"] = np.asarray(
            params[f"layers_{i}_ff_res"]["proj"]["kernel"]
        ).T
    return out


# The registered DDPM buffers, in reference order (models/ddpm.py:67-138).
# The reference's torch name for the timestep-sampling weights is
# "p2_loss_weight"; this framework calls the same array "loss_weights".
_DDPM_BUFFER_NAMES = (
    ("betas", "betas"),
    ("alphas_cumprod", "alphas_cumprod"),
    ("alphas_cumprod_prev", "alphas_cumprod_prev"),
    ("sqrt_alphas_cumprod", "sqrt_alphas_cumprod"),
    ("sqrt_one_minus_alphas_cumprod", "sqrt_one_minus_alphas_cumprod"),
    ("log_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod"),
    ("sqrt_recip_alphas_cumprod", "sqrt_recip_alphas_cumprod"),
    ("sqrt_recipm1_alphas_cumprod", "sqrt_recipm1_alphas_cumprod"),
    ("posterior_variance", "posterior_variance"),
    ("posterior_log_variance_clipped", "posterior_log_variance_clipped"),
    ("posterior_mean_coef1", "posterior_mean_coef1"),
    ("posterior_mean_coef2", "posterior_mean_coef2"),
    ("p2_loss_weight", "loss_weights"),
)


def build_ema_pytorch_state_dict(
    diffusion, ema_params: dict, online_params: dict = None, step: int = 0
) -> Dict[str, np.ndarray]:
    """Full ``EMA(GaussianDiffusion)`` state dict in ema-pytorch 0.0.8 layout.

    The reference's ``sample.py:154-167`` builds ``EMA(GaussianDiffusion)``
    (pinned ema-pytorch==0.0.8, coarse-graining-environment.yml:22) and calls
    a *strict* ``load_state_dict`` on ``data_dict["ema"]``; that module's
    state dict contains, beyond the EMA weights, the online model, every DDPM
    registered buffer under both prefixes, and the ``initted`` / ``step``
    bookkeeping buffers (``EMA.__init__`` assigns ``self.online_model`` /
    ``self.ema_model`` as submodules and registers the two scalars). A file
    holding only ``ema_model.model.*`` fails that load — this builds the
    complete key set:

    - ``initted`` (shape (1,)), ``step`` (shape (1,))
    - ``{online_model,ema_model}.model.<net key>`` for every score-net tensor
    - ``{online_model,ema_model}.<buffer>`` for the 13 DDPM buffers
      (reference models/ddpm.py:67-138; "p2_loss_weight" is this framework's
      ``buffers.loss_weights``)

    ``online_params`` defaults to the EMA weights (the reference sampler only
    ever reads ``ema_model.*``).
    """
    n_layers = diffusion.model.n_layers
    nets = {
        "online_model": params_to_torch_state_dict(
            ema_params if online_params is None else online_params, n_layers
        ),
        "ema_model": params_to_torch_state_dict(ema_params, n_layers),
    }
    buffers = {
        torch_name: np.asarray(getattr(diffusion.buffers, ours), np.float32)
        for torch_name, ours in _DDPM_BUFFER_NAMES
    }
    out: Dict[str, np.ndarray] = {
        "initted": np.asarray([True]),
        "step": np.asarray([int(step)], dtype=np.int64),
    }
    for prefix, net in nets.items():
        for k, v in net.items():
            out[f"{prefix}.model.{k}"] = v
        for k, v in buffers.items():
            out[f"{prefix}.{k}"] = v
    return out


def load_torch_checkpoint_as_params(path: str, model) -> dict:
    """Load a reference model-*.pt and return the EMA weights as flax params."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    state = data["ema"] if isinstance(data, dict) and "ema" in data else data
    return torch_state_dict_to_params(state, model.n_layers)
