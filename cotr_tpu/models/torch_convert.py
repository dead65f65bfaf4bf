"""Convert reference PyTorch COTR checkpoints to Flax params (and back).

The reference ships weights as a torch state dict inside
``checkpoint.pth.tar`` under ``model_state_dict`` (reference
COTR/trainers/cotr_trainer.py:75-88).  Key layout (DETR lineage):

    backbone.0.body.{conv1,bn1,layerX.Y.*}          backbone.py:95-107
    input_proj.{weight,bias}                        cotr_model.py:23
    transformer.encoder.layers.N.{self_attn.*,linear1,linear2,norm1,norm2}
    transformer.decoder.layers.N.{multihead_attn.*,linear1,linear2,norm2,norm3}
    transformer.decoder.norm.*                      transformer.py:33
    corr_embed.layers.{0,1,2}.*                     cotr_model.py:21

Decoder ``norm1``/``self_attn`` keys (if present from older checkpoints) are
ignored — the reference decoder layer defines but never uses norm1
(transformer.py:173).

Layout transforms: torch Conv2d OIHW -> Flax HWIO; torch Linear (out, in) ->
Flax (in, out); packed in_proj_weight (3d, d) -> separate q/k/v kernels;
LayerNorm weight -> scale.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _bn(dst: Dict, t: Mapping[str, np.ndarray], tk: str) -> None:
    dst["weight"] = t[f"{tk}.weight"]
    dst["bias"] = t[f"{tk}.bias"]
    dst["running_mean"] = t[f"{tk}.running_mean"]
    dst["running_var"] = t[f"{tk}.running_var"]


def _dense(t: Mapping[str, np.ndarray], tk: str) -> Dict:
    return {"kernel": _linear(t[f"{tk}.weight"]), "bias": t[f"{tk}.bias"]}


def _layernorm(t: Mapping[str, np.ndarray], tk: str) -> Dict:
    return {"scale": t[f"{tk}.weight"], "bias": t[f"{tk}.bias"]}


def _mha(t: Mapping[str, np.ndarray], tk: str, d_model: int) -> Dict:
    wq, wk, wv = np.split(t[f"{tk}.in_proj_weight"], 3, axis=0)
    bq, bk, bv = np.split(t[f"{tk}.in_proj_bias"], 3, axis=0)
    return {
        "q_proj": {"kernel": _linear(wq), "bias": bq},
        "k_proj": {"kernel": _linear(wk), "bias": bk},
        "v_proj": {"kernel": _linear(wv), "bias": bv},
        "out_proj": _dense(t, f"{tk}.out_proj"),
    }


_STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _resnet_params(t: Mapping[str, np.ndarray], prefix: str, variant: str,
                   out_layer: str) -> Dict:
    body: Dict = {"conv1": {"kernel": _conv_kernel(t[f"{prefix}.conv1.weight"])},
                  "bn1": {}}
    _bn(body["bn1"], t, f"{prefix}.bn1")
    blocks = _STAGE_BLOCKS[variant]
    out_idx = int(out_layer[-1])
    for stage in range(out_idx):
        for i in range(blocks[stage]):
            tk = f"{prefix}.layer{stage + 1}.{i}"
            blk: Dict = {}
            for c in ("conv1", "conv2", "conv3"):
                blk[c] = {"kernel": _conv_kernel(t[f"{tk}.{c}.weight"])}
            for bnn in ("bn1", "bn2", "bn3"):
                blk[bnn] = {}
                _bn(blk[bnn], t, f"{tk}.{bnn}")
            if i == 0:
                blk["downsample_conv"] = {
                    "kernel": _conv_kernel(t[f"{tk}.downsample.0.weight"])}
                blk["downsample_bn"] = {}
                _bn(blk["downsample_bn"], t, f"{tk}.downsample.1")
            body[f"layer{stage + 1}_block{i}"] = blk
    return body


def torch_state_dict_to_flax(state: Mapping, cfg) -> Dict:
    """Reference torch state dict -> Flax params pytree for COTRModel."""
    t = {k.replace("module.", ""): np.asarray(v.detach().cpu().numpy()
                                              if hasattr(v, "detach") else v,
                                              dtype=np.float32)
         for k, v in state.items()}

    params: Dict = {}
    params["backbone"] = {
        "body": _resnet_params(t, "backbone.0.body", cfg.backbone, cfg.layer)}
    params["input_proj"] = {
        "kernel": _conv_kernel(t["input_proj.weight"]),
        "bias": t["input_proj.bias"],
    }

    tr: Dict = {}
    for i in range(cfg.enc_layers):
        tk = f"transformer.encoder.layers.{i}"
        tr[f"enc{i}"] = {
            "self_attn": _mha(t, f"{tk}.self_attn", cfg.hidden_dim),
            "ffn": {"linear1": _dense(t, f"{tk}.linear1"),
                    "linear2": _dense(t, f"{tk}.linear2")},
            "norm1": _layernorm(t, f"{tk}.norm1"),
            "norm2": _layernorm(t, f"{tk}.norm2"),
        }
    for i in range(cfg.dec_layers):
        tk = f"transformer.decoder.layers.{i}"
        tr[f"dec{i}"] = {
            "cross_attn": _mha(t, f"{tk}.multihead_attn", cfg.hidden_dim),
            "ffn": {"linear1": _dense(t, f"{tk}.linear1"),
                    "linear2": _dense(t, f"{tk}.linear2")},
            "norm2": _layernorm(t, f"{tk}.norm2"),
            "norm3": _layernorm(t, f"{tk}.norm3"),
        }
    tr["decoder_norm"] = _layernorm(t, "transformer.decoder.norm")
    params["transformer"] = tr

    params["corr_embed"] = {
        f"fc{i}": _dense(t, f"corr_embed.layers.{i}") for i in range(3)}
    return {"params": params}


def flax_to_torch_state_dict(variables: Mapping, cfg) -> Dict[str, np.ndarray]:
    """Inverse mapping (used by tests to drive a torch oracle)."""
    p = variables["params"]
    out: Dict[str, np.ndarray] = {}

    def put_conv(tk, node):
        out[f"{tk}.weight"] = np.transpose(np.asarray(node["kernel"]),
                                           (3, 2, 0, 1))

    def put_bn(tk, node):
        for name in ("weight", "bias", "running_mean", "running_var"):
            out[f"{tk}.{name}"] = np.asarray(node[name])

    def put_dense(tk, node):
        out[f"{tk}.weight"] = np.transpose(np.asarray(node["kernel"]), (1, 0))
        out[f"{tk}.bias"] = np.asarray(node["bias"])

    def put_ln(tk, node):
        out[f"{tk}.weight"] = np.asarray(node["scale"])
        out[f"{tk}.bias"] = np.asarray(node["bias"])

    def put_mha(tk, node):
        wq = np.transpose(np.asarray(node["q_proj"]["kernel"]), (1, 0))
        wk = np.transpose(np.asarray(node["k_proj"]["kernel"]), (1, 0))
        wv = np.transpose(np.asarray(node["v_proj"]["kernel"]), (1, 0))
        out[f"{tk}.in_proj_weight"] = np.concatenate([wq, wk, wv], axis=0)
        out[f"{tk}.in_proj_bias"] = np.concatenate(
            [np.asarray(node[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")])
        put_dense(f"{tk}.out_proj", node["out_proj"])

    body = p["backbone"]["body"]
    put_conv("backbone.0.body.conv1", body["conv1"])
    put_bn("backbone.0.body.bn1", body["bn1"])
    blocks = _STAGE_BLOCKS[cfg.backbone]
    for stage in range(int(cfg.layer[-1])):
        for i in range(blocks[stage]):
            blk = body[f"layer{stage + 1}_block{i}"]
            tk = f"backbone.0.body.layer{stage + 1}.{i}"
            for c in ("conv1", "conv2", "conv3"):
                put_conv(f"{tk}.{c}", blk[c])
            for bnn in ("bn1", "bn2", "bn3"):
                put_bn(f"{tk}.{bnn}", blk[bnn])
            if i == 0:
                put_conv(f"{tk}.downsample.0", blk["downsample_conv"])
                put_bn(f"{tk}.downsample.1", blk["downsample_bn"])

    put_conv("input_proj", p["input_proj"])
    out["input_proj.bias"] = np.asarray(p["input_proj"]["bias"])

    tr = p["transformer"]
    for i in range(cfg.enc_layers):
        tk = f"transformer.encoder.layers.{i}"
        put_mha(f"{tk}.self_attn", tr[f"enc{i}"]["self_attn"])
        put_dense(f"{tk}.linear1", tr[f"enc{i}"]["ffn"]["linear1"])
        put_dense(f"{tk}.linear2", tr[f"enc{i}"]["ffn"]["linear2"])
        put_ln(f"{tk}.norm1", tr[f"enc{i}"]["norm1"])
        put_ln(f"{tk}.norm2", tr[f"enc{i}"]["norm2"])
    for i in range(cfg.dec_layers):
        tk = f"transformer.decoder.layers.{i}"
        put_mha(f"{tk}.multihead_attn", tr[f"dec{i}"]["cross_attn"])
        put_dense(f"{tk}.linear1", tr[f"dec{i}"]["ffn"]["linear1"])
        put_dense(f"{tk}.linear2", tr[f"dec{i}"]["ffn"]["linear2"])
        put_ln(f"{tk}.norm2", tr[f"dec{i}"]["norm2"])
        put_ln(f"{tk}.norm3", tr[f"dec{i}"]["norm3"])
    put_ln("transformer.decoder.norm", tr["decoder_norm"])

    for i in range(3):
        put_dense(f"corr_embed.layers.{i}", p["corr_embed"][f"fc{i}"])
    return out


def load_torch_checkpoint(path: str, cfg) -> Dict:
    """Load a reference ``checkpoint.pth.tar`` / ``*.pth`` into Flax params.

    Accepts either a bare state dict or the trainer's
    {epoch, iteration, optim_state_dict, model_state_dict} wrapper
    (reference cotr_trainer.py:75-88).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    return torch_state_dict_to_flax(state, cfg)
