"""SDF asset resolution: DeepSDF checkpoints, latent codes, normalization.

Parity: load_obj_for_opt (/root/reference/network/models/track_network.py:
39-88) — per-dataset path logic for the decoder checkpoint, instance latent
code, normalization parameters and gt/recon meshes — plus the category<->
instance frame change of optimization_obj.py:23-62 (CatPose2InsPose.npy).

Torch checkpoints are converted weight-for-weight into the flax SDFDecoder
(weight-norm g/v split preserved). For environments without the licensed
assets (tests, synthetic benchmarks) `synthetic_box_sdf_setup` builds an
analytic box SDF volume matching the synthetic dataset generator's object.
"""

from __future__ import annotations

import os
from os.path import join as pjoin
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .decoder import SDFDecoder
from .volume import volume_coords


class ObjSDFAssets(NamedTuple):
    latent_code_pth: str
    normalization: dict          # {'offset' (3,), 'scale' (1,)}
    model_pth: str
    gt_mesh_path: str | None
    recon_mesh_path: str | None


def load_obj_for_opt(root_dir: str, dataset_name: str, sdf_code_source: str,
                     seq_frame: str, instance: str) -> ObjSDFAssets:
    """Resolve asset paths (track_network.py:39-88)."""
    if dataset_name == "HO3D":
        model_pth = pjoin(root_dir, "../SimGrasp/SDF/examples/bottle_sim/ModelParameters/2000.pth")
        norm_pth = pjoin(root_dir, f"../YCB/SDF/NormalizationParameters/{instance}/textured_simple.npz")
        gt_mesh = pjoin(root_dir, f"../YCB/models/{instance}/textured_simple.obj")
        if sdf_code_source == "gt":
            latent = pjoin(root_dir, f"../YCB/SDF/2000/Codes/gt/{instance}.pth")
            recon = gt_mesh
        else:
            latent = pjoin(root_dir, "SDF/2000/Codes/pred/%s.pth" % seq_frame.replace("/", "_"))
            recon = latent.replace("Codes", "Meshes").replace(".pth", ".ply")
    elif dataset_name == "SimGrasp":
        if "sim" not in instance:
            instance = instance + "_sim"
        latent_dir = pjoin(root_dir, f"SDF/Reconstructions/{instance}/2000/Codes")
        latent = pjoin(latent_dir, (seq_frame[:5] if sdf_code_source == "gt"
                                    else seq_frame) + ".pth")
        recon = latent.replace("Codes", "Meshes").replace(".pth", ".ply")
        norm_pth = pjoin(root_dir, f"SDF/NormalizationParameters/{instance}", seq_frame[:5] + ".npz")
        model_pth = pjoin(root_dir, f"SDF/examples/{instance}/ModelParameters/2000.pth")
        gt_mesh = pjoin(root_dir, f"objs/{instance}/{seq_frame[:5]}.obj")
    elif dataset_name == "DexYCB":
        gt_mesh = pjoin(root_dir, f"../YCB/models/{instance}/textured_simple.obj")
        if sdf_code_source == "gt":
            latent = pjoin(root_dir, f"../YCB/SDF/2000/Codes/gt/{instance}.pth")
            recon = gt_mesh
        else:
            latent = pjoin(root_dir, "SDF/2000/Codes/pred/%s.pth" % seq_frame.replace("+", "_"))
            recon = (latent.replace("Codes", "Meshes")
                     .replace("pred/", f"pred/{instance}_").replace(".pth", ".ply"))
        norm_pth = pjoin(root_dir, f"../YCB/SDF/NormalizationParameters/{instance}/textured_simple.npz")
        which = "bowl_sim" if "bowl" in instance else "bottle_sim"
        model_pth = pjoin(root_dir, f"../SimGrasp/SDF/examples/{which}/ModelParameters/2000.pth")
    else:
        raise NotImplementedError(dataset_name)
    norm = dict(np.load(norm_pth))
    return ObjSDFAssets(latent, norm, model_pth, gt_mesh, recon)


def load_torch_decoder(model_pth: str, network_specs: dict):
    """Convert a torch DeepSDF checkpoint into flax SDFDecoder variables.

    torch layout (after DataParallel prefix strip): lin{i}.weight_g (out,1),
    lin{i}.weight_v (out,in), lin{i}.bias (deep_sdf_decoder.py:47-51)."""
    import torch
    state = torch.load(model_pth, map_location="cpu")["model_state_dict"]
    params = {}
    for k, v in state.items():
        k = k.replace("module.", "")
        name, attr = k.split(".", 1)
        arr = jnp.asarray(v.numpy())
        p = params.setdefault(name, {})
        if attr in ("weight_g",):
            p["g"] = arr.reshape(-1, 1)
        elif attr in ("weight_v",):
            p["v"] = arr
        elif attr == "weight":  # non-weight-norm layer
            p["kernel"] = arr.T
        elif attr == "bias":
            p["bias"] = arr
    decoder = SDFDecoder(latent_size=256, **{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in network_specs.items()
        if k in ("dims", "dropout", "dropout_prob", "norm_layers", "latent_in",
                 "weight_norm", "use_tanh")})
    return decoder, {"params": params}


def load_torch_latent(latent_pth: str) -> jnp.ndarray:
    import torch
    code = torch.load(latent_pth, map_location="cpu")
    if isinstance(code, (list, tuple)):
        code = code[0]
    code = code.reshape(-1)
    return jnp.asarray(code.detach().numpy())


def cat_to_ins_coords(coords, normalization, rotation=None, translation=None):
    """Category frame -> DeepSDF instance frame (CatCS2InsCS,
    optimization_obj.py:23-37). For HO3D/DexYCB pass the per-instance R/T from
    CatPose2InsPose.npy."""
    out = (coords + jnp.asarray(normalization["offset"])) * jnp.asarray(
        normalization["scale"])
    if rotation is not None:
        out = jnp.matmul(out, jnp.swapaxes(jnp.asarray(rotation), -1, -2))
        out = out + jnp.asarray(translation)
    return out


def synthetic_box_sdf_setup(volume_size: int = 201, voxel_scale: float = 0.002,
                            half=(0.035, 0.05, 0.025)) -> jnp.ndarray:
    """Analytic box SDF volume matching data/synthetic.py's object — the test/
    benchmark stand-in for the baked DeepSDF volume."""
    c = volume_coords(volume_size, voxel_scale)
    q = jnp.abs(c) - jnp.asarray(half)
    outside = jnp.linalg.norm(jnp.clip(q, min=0.0), axis=-1)
    inside = jnp.clip(jnp.max(q, axis=-1), max=0.0)
    return (outside + inside).reshape(volume_size, volume_size, volume_size)
