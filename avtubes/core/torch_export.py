"""Export avtubes param pytrees as reference-compatible torch checkpoints.

The inverse of `core/torch_import.py`: turns our `{params, batch_stats}`
flax trees back into a PyTorch state_dict with the reference's module
names, so a model trained (or fine-tuned) in avtubes can be loaded by the
reference stack unchanged (`test.py:64-68`, `train_hardway.py:93-100`) —
e.g. to cross-validate cIoU/AUC numbers in the original eval harness.

Name translation is the exact inverse of the importer:
    stem_vision / stem_audio / stem_flow -> conv1 / conv1_a / conv1_flow
    stem_bn                              -> bn1
    layer{L}_block{B}.conv{1,2}.kernel   -> layer{L}.{B}.conv{1,2}.weight
    ...bn{1,2}.{scale,bias}              -> layer{L}.{B}.bn{1,2}.{weight,bias}
    batch_stats ...bn.{mean,var}         -> ...running_{mean,var}
    downsample_conv / downsample_bn      -> downsample.{0,1}
Conv kernels transpose HWIO -> OIHW (DHWIO -> OIDHW for 3D).

The reference ResNet owns tensors our model never has — all three modal
stems regardless of modality, and the dead avgpool/fc classifier head
(`models/base_models.py:135-152`); BatchNorm also tracks
`num_batches_tracked`.  With ``strict=True`` (default) those are
synthesized so ``load_state_dict(sd, strict=True)`` succeeds: unused
stems and the fc head as zeros (inert — neither participates in the
localization forward, `models/base_models.py:196-210`), counters as 0.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from avtubes.core.torch_import import _STEM_BY_TORCH_NAME

_TORCH_NAME_BY_STEM = {v: k for k, v in _STEM_BY_TORCH_NAME.items()}
# (in_channels, kernel) of each reference 2D stem, `base_models.py:135-140`
_STEM_SHAPES_2D = {"conv1": 3, "conv1_a": 1, "conv1_flow": 6}


def _bn_out(params_node: dict, stats_node: dict, torch_prefix: str,
            out: dict[str, np.ndarray]) -> None:
    scale = np.asarray(params_node["scale"], np.float32)
    out[f"{torch_prefix}.weight"] = scale
    out[f"{torch_prefix}.bias"] = np.asarray(params_node["bias"], np.float32)
    # an un-trained tree may carry no batch_stats yet — emit identity stats
    out[f"{torch_prefix}.running_mean"] = np.asarray(
        stats_node.get("mean", np.zeros_like(scale)), np.float32)
    out[f"{torch_prefix}.running_var"] = np.asarray(
        stats_node.get("var", np.ones_like(scale)), np.float32)
    out[f"{torch_prefix}.num_batches_tracked"] = np.int64(0)


def _convert_resnet(params: dict, stats: dict, prefix: str,
                    out: dict[str, np.ndarray], conv3d: bool = False) -> None:
    """Translate one backbone's flax tree into torch entries under `prefix`."""
    transpose = (4, 3, 0, 1, 2) if conv3d else (3, 2, 0, 1)

    def kernel(node) -> np.ndarray:
        return np.asarray(node["kernel"], np.float32).transpose(transpose)

    for name, node in sorted(params.items()):
        if name == "stem_bn":
            _bn_out(node, stats.get("stem_bn", {}), f"{prefix}bn1", out)
        elif name.startswith("stem"):
            torch_stem = "conv1" if conv3d else _TORCH_NAME_BY_STEM[name]
            out[f"{prefix}{torch_stem}.weight"] = kernel(node)
        elif "_block" in name:
            layer, block = name.split("_block")
            tp = f"{prefix}{layer}.{block}."
            block_stats = stats.get(name, {})
            for sub, val in sorted(node.items()):
                if sub in ("conv1", "conv2"):
                    out[f"{tp}{sub}.weight"] = kernel(val)
                elif sub in ("bn1", "bn2"):
                    _bn_out(val, block_stats.get(sub, {}), tp + sub, out)
                elif sub == "downsample_conv":
                    out[f"{tp}downsample.0.weight"] = kernel(val)
                elif sub == "downsample_bn":
                    _bn_out(val, block_stats.get(sub, {}), f"{tp}downsample.1",
                            out)
                else:
                    raise ValueError(f"unknown block entry {name}.{sub}")
        else:
            raise ValueError(f"unknown backbone entry {name}")


def _fill_dead_tensors(out: dict[str, np.ndarray], prefix: str,
                       num_classes: int, conv3d: bool = False) -> None:
    """Zeros for tensors the reference owns but the forward never uses."""
    if not conv3d:
        for stem, in_ch in _STEM_SHAPES_2D.items():
            out.setdefault(f"{prefix}{stem}.weight",
                           np.zeros((64, in_ch, 7, 7), np.float32))
    width = 512  # layer4 output channels, both backbones
    out.setdefault(f"{prefix}fc.weight", np.zeros((num_classes, width),
                                                  np.float32))
    out.setdefault(f"{prefix}fc.bias", np.zeros((num_classes,), np.float32))


def avenet_to_torch(variables: dict[str, Any],
                    strict: bool = True) -> dict[str, np.ndarray]:
    """avtubes.AVENet {'params','batch_stats'} -> reference AVENet state_dict.

    `strict=True` adds the reference's dead tensors (unused modal stems,
    fc head, BN counters) so `AVENet(...).load_state_dict(sd)` passes with
    strict checking; `strict=False` emits only the semantically meaningful
    tensors (load with `strict=False`).
    """
    params, stats = variables["params"], variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}
    for net in ("imgnet", "audnet"):
        _convert_resnet(params[net], stats.get(net, {}), f"{net}.", out)
        if strict:
            _fill_dead_tensors(out, f"{net}.", num_classes=1000)
    return out


def fullmodel_to_torch(variables: dict[str, Any], strict: bool = True,
                       vid_classes: int = 1039) -> dict[str, np.ndarray]:
    """avtubes.FullModel tree -> reference FullModel state_dict.

    `vid_classes` sizes the 3D backbone's dead fc head — the reference
    builds it with n_classes=1039 (`model.py:20`).
    """
    params, stats = variables["params"], variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}
    _convert_resnet(params["vidnet"], stats.get("vidnet", {}), "vidnet.", out,
                    conv3d=True)
    _convert_resnet(params["audnet"], stats.get("audnet", {}), "audnet.", out)
    if strict:
        _fill_dead_tensors(out, "vidnet.", num_classes=vid_classes,
                           conv3d=True)
        _fill_dead_tensors(out, "audnet.", num_classes=1000)
    return out


def save_torch_checkpoint(path: str | Path, state_dict: dict[str, np.ndarray],
                          epoch: int = 0) -> Path:
    """Write `.pth.tar` in the reference's checkpoint envelope.

    `{'epoch', 'model_state_dict', 'optimizer_state_dict'}` is what every
    reference loader expects (`train.py:223-227`, `test.py:64-68`); the
    optimizer entry is an empty dict — torch optimizers re-init from it
    as from scratch.
    """
    import torch

    tensors = {
        k: torch.tensor(v) if np.ndim(v) else
        torch.tensor(int(v), dtype=torch.long)
        for k, v in state_dict.items()
    }
    path = Path(path)
    torch.save({"epoch": int(epoch), "model_state_dict": tensors,
                "optimizer_state_dict": {}}, path)
    return path
