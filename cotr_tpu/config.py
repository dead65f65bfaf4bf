"""Typed configuration for model / training / inference.

Replaces the reference's argparse option groups
(/root/reference COTR/options/options.py:13-52) with frozen dataclasses that
serialize to JSON. Defaults reproduce the published model
(resnet50 / layer3 / d_model 256 / 8 heads / 6+6 layers / FFN 1024 /
lin_sine positional embedding; reference train_cotr.py:117-121).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple


_LAYER_CHANNELS = {
    "layer1": 256,
    "layer2": 512,
    "layer3": 1024,
    "layer4": 2048,
}

_LAYER_STRIDE = {
    "layer1": 4,
    "layer2": 8,
    "layer3": 16,
    "layer4": 32,
}


@dataclasses.dataclass(frozen=True)
class COTRConfig:
    """Model hyper-parameters (reference options.py:41-51)."""

    backbone: str = "resnet50"
    layer: str = "layer3"
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dropout: float = 0.1
    dilation: bool = False
    position_embedding: str = "lin_sine"  # or "exp_sine"
    activation: str = "relu"
    #: compute dtype for backbone+transformer ("float32" or "bfloat16");
    #: params are always float32, and the correspondence head always runs fp32.
    dtype: str = "float32"
    #: use the fused Pallas cross-attention kernel (TPU only; inference /
    #: zero-dropout paths). Falls back to the XLA einsum path otherwise.
    use_flash_attention: bool = False
    #: rematerialize transformer layers in the backward pass (jax.checkpoint)
    #: — trades ~30% extra forward FLOPs for O(layers) less activation HBM,
    #: enabling larger training batches.
    remat: bool = False

    @property
    def backbone_channels(self) -> int:
        return _LAYER_CHANNELS[self.layer]

    @property
    def backbone_stride(self) -> int:
        s = _LAYER_STRIDE[self.layer]
        return s // 2 if (self.dilation and self.layer == "layer4") else s

    @property
    def dim_feedforward(self) -> int:
        # Reference ties FFN width to backbone channel count
        # (train_cotr.py:117-121, backbone.py:132).
        return self.backbone_channels

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "COTRConfig":
        return cls(**json.loads(s))


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Sparse/dense engine settings (reference demo defaults).

    ``zoom_ins`` mirrors np.linspace(0.5, 0.0625, 4) used by every demo
    (reference demo_single_pair.py:37)."""

    zoom_ins: Tuple[float, ...] = (0.5, 0.354166667, 0.208333333, 0.0625)
    converge_iters: int = 1
    batch_size: int = 32
    max_corrs: int = 1000
    mode: str = "stretching"  # or "tile"
    #: queries per shared crop-pair in grouped refinement (reference
    #: FasterSparseEngine max_load, sparse_engine.py:273).
    max_load: int = 256


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training settings (reference train_cotr.py:49-57, readme.md:44-52)."""

    learning_rate: float = 1e-4
    lr_backbone: float = 0.0
    #: "constant" (reference behavior) or "cosine": decay every group's lr
    #: from its base to base*lr_final_frac over lr_decay_steps. One decayed
    #: run replaces the round-3 chain of warm-started constant-lr legs
    #: (PERF.md §6: constant-lr plateau noise made checkpoint quality
    #: depend on the sampling instant).
    lr_schedule: str = "constant"
    lr_decay_steps: int = 0
    lr_final_frac: float = 0.03
    batch_size: int = 24
    max_iter: int = 300_000
    valid_iter: int = 1000
    #: cadence (in steps) of train-loop tensorboard scalars/histograms
    tb_iter: int = 50
    num_kp: int = 100
    bidirectional: bool = True
    cycle_consis: bool = True
    seed: int = 0
    #: number of data-parallel shards (devices) for the pjit train step.
    num_devices: Optional[int] = None
    out_dir: str = "out"
    suffix: str = ""

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)


def compact_name(model_cfg: COTRConfig, train_cfg: TrainConfig,
                 dataset_name: str = "megadepth") -> str:
    """Deterministic run naming (reference options_utils.py:18-30)."""
    name = (
        f"model:cotr_{model_cfg.backbone}_{model_cfg.layer}_{model_cfg.hidden_dim}"
        f"_dset:{dataset_name}"
        f"_bs:{train_cfg.batch_size}"
        f"_pe:{model_cfg.position_embedding}"
        f"_lrbackbone:{train_cfg.lr_backbone}"
    )
    if train_cfg.suffix:
        name += f"_suffix:{train_cfg.suffix}"
    return name


def save_params_json(path: str, model_cfg: COTRConfig, train_cfg: TrainConfig,
                     extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a params.json for config-drift detection
    (reference options_utils.py:62-86)."""
    payload = {
        "model": dataclasses.asdict(model_cfg),
        "train": dataclasses.asdict(train_cfg),
    }
    if extra:
        payload["extra"] = extra
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)


def build_scenes_name_list(dataset_config: Dict[str, Any],
                           scene_ids: Any) -> list:
    """Expand scene/sequence ids through directory templates
    (reference options_utils.py:88-108): dataset_config provides f-string
    templates {scene_dir,image_dir,depth_dir} with ``{scene}``/``{seq}``
    placeholders; scene_ids is a list of (scene, seq) pairs or
    "scene/seq" strings."""
    out = []
    for item in scene_ids:
        if isinstance(item, str):
            scene, _, seq = item.partition("/")
        else:
            scene, seq = item
        out.append({
            k: dataset_config[k].format(scene=scene, seq=seq)
            for k in ("scene_dir", "image_dir", "depth_dir")
        })
    return out


def check_params_json(path: str, model_cfg: COTRConfig,
                      train_cfg: TrainConfig) -> bool:
    """Return True iff an existing params.json matches the given configs.

    Config fields added after a run was launched are absent from its saved
    params.json; they are treated as holding the dataclass default instead
    of refusing an otherwise-identical resume. This back-fill is only sound
    if every NEW config field's declared default equals the behavior old
    runs implicitly had — when adding a field whose default changes
    behavior, bump the schema by renaming the field (or record a version
    key) so the drift gate refuses instead of silently passing."""
    with open(path) as f:
        old = json.load(f)
    new = {
        "model": dataclasses.asdict(model_cfg),
        "train": dataclasses.asdict(train_cfg),
    }
    defaults = {"model": dataclasses.asdict(COTRConfig()),
                "train": dataclasses.asdict(TrainConfig())}
    for sect in ("model", "train"):
        if isinstance(old.get(sect), dict):
            for field, dval in defaults[sect].items():
                old[sect].setdefault(field, dval)
    return old.get("model") == new["model"] and old.get("train") == new["train"]
