"""Import reference PyTorch checkpoints (.pth.tar) into avtubes param pytrees.

The reference ships/loads torch checkpoints of AVENet / FullModel
(`train_hardway.py:93-100`, `test.py:64-68`, `train_3D.py:89`); this module
reads a torch `{.., model_state_dict}` (or a bare state_dict) and produces
the `{params, batch_stats}` pytree for our flax models, so parity runs can
start from the reference's exact weights.

Name translation (reference `models/base_models.py` -> avtubes ResNet2D):
    conv1 / conv1_a / conv1_flow          -> stem_vision / stem_audio / stem_flow
    bn1                                   -> stem_bn
    layer{L}.{B}.conv{1,2}.weight         -> layer{L}_block{B}.conv{1,2}.kernel
    layer{L}.{B}.bn{1,2}.{weight,bias}    -> ...bn{1,2}.{scale,bias}
    layer{L}.{B}.bn{1,2}.running_{mean,var} -> batch_stats ...bn{1,2}.{mean,var}
    layer{L}.{B}.downsample.{0,1}         -> downsample_conv / downsample_bn
Conv kernels transpose OIHW -> HWIO (NCDHW -> DHWIO for 3D); the dead
avgpool/fc heads are dropped.  A leading DataParallel "module." prefix is
stripped.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

_STEM_BY_TORCH_NAME = {"conv1": "stem_vision", "conv1_a": "stem_audio",
                       "conv1_flow": "stem_flow"}


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model_state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_resnet(sd: dict[str, np.ndarray], prefix: str, modal: str,
                    params: dict, stats: dict, conv3d: bool = False) -> int:
    """Translate one backbone's entries; returns number of tensors consumed."""
    used = 0
    transpose = (2, 3, 4, 1, 0) if conv3d else (2, 3, 1, 0)
    my_stem = f"stem_{modal}" if not conv3d else "stem"
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        parts = name.split(".")
        if parts[0] in ("avgpool", "fc"):  # dead heads
            used += 1
            continue
        if parts[0] in _STEM_BY_TORCH_NAME or (conv3d and parts[0] == "conv1"):
            if not conv3d and _STEM_BY_TORCH_NAME[parts[0]] != my_stem:
                used += 1  # stem for a different modality — not in our tree
                continue
            _set(params, [my_stem, "kernel"], val.transpose(transpose))
            used += 1
        elif parts[0] == "bn1":
            used += _bn_entry(["stem_bn"], parts[1], val, params, stats)
        elif parts[0].startswith("layer"):
            layer = parts[0]          # layerL
            block = f"{layer}_block{parts[1]}"
            rest = parts[2:]
            if rest[0] in ("conv1", "conv2"):
                _set(params, [block, rest[0], "kernel"], val.transpose(transpose))
                used += 1
            elif rest[0] in ("bn1", "bn2"):
                used += _bn_entry([block, rest[0]], rest[1], val, params, stats)
            elif rest[0] == "downsample":
                if rest[1] == "0":
                    _set(params, [block, "downsample_conv", "kernel"],
                         val.transpose(transpose))
                    used += 1
                else:
                    used += _bn_entry([block, "downsample_bn"], rest[2], val,
                                      params, stats)
    return used


def _bn_entry(path: list[str], field: str, val: np.ndarray,
              params: dict, stats: dict) -> int:
    if field == "weight":
        _set(params, path + ["scale"], val)
    elif field == "bias":
        _set(params, path + ["bias"], val)
    elif field == "running_mean":
        _set(stats, path + ["mean"], val)
    elif field == "running_var":
        _set(stats, path + ["var"], val)
    else:  # num_batches_tracked
        return 1
    return 1


def avenet_from_torch(path: str | Path) -> dict[str, Any]:
    """Reference AVENet checkpoint -> {'params', 'batch_stats'} for avtubes.AVENet."""
    sd = load_torch_state_dict(path)
    params: dict = {"imgnet": {}, "audnet": {}}
    stats: dict = {"imgnet": {}, "audnet": {}}
    _convert_resnet(sd, "imgnet.", "vision", params["imgnet"], stats["imgnet"])
    _convert_resnet(sd, "audnet.", "audio", params["audnet"], stats["audnet"])
    return {"params": params, "batch_stats": stats}


def fullmodel_from_torch(path: str | Path) -> dict[str, Any]:
    """Reference FullModel / r3d checkpoint -> {'params','batch_stats'} for FullModel."""
    sd = load_torch_state_dict(path)
    params: dict = {"vidnet": {}, "audnet": {}}
    stats: dict = {"vidnet": {}, "audnet": {}}
    if any(k.startswith("vidnet.") for k in sd):
        _convert_resnet(sd, "vidnet.", "", params["vidnet"], stats["vidnet"], conv3d=True)
        _convert_resnet(sd, "audnet.", "audio", params["audnet"], stats["audnet"])
    else:  # a bare r3d18 Kinetics checkpoint (pretrained/r3d18_KM_200ep.pth)
        _convert_resnet(sd, "", "", params["vidnet"], stats["vidnet"], conv3d=True)
    return {"params": params, "batch_stats": stats}
