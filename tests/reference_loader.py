"""Import machinery for running the torch reference (/root/reference) on CPU.

The reference is CUDA-era research code with several heavyweight optional
dependencies that are absent here (chumpy, open3d, skimage, plyfile, trimesh).
Every use we exercise has a CPU/torch-only core:

  - chumpy is touched only inside `ready_arguments` (our_mano.py:39-70) to
    unwrap MANO pkl fields; a numpy-view stub with an `.r` property is
    faithful for plain-array pkls (which `write_fake_mano_pkl` produces).
  - open3d / skimage / plyfile / trimesh are used only in shape-update /
    meshing paths that the parity tests do not cross; empty module stubs
    satisfy the imports.
  - `.cuda()` calls (IKNet.__init__ composes OurManoLayer().cuda(),
    hand_network.py:261; optimization_obj moves volumes) are patched to
    no-ops, keeping everything on CPU.
  - optimization_obj loads `data/YCB/CatPose2InsPose.npy` relative to CWD at
    import time (optimization_obj.py:12); the import runs chdir'd into a
    scratch dir carrying a placeholder table.

The reference's CPU FPS fallback starts from a *random* index
(pointnet_utils.py:129) while the CUDA kernel — the behavior the released
checkpoints were trained with, and the one this package reproduces — seeds at
index 0 (sampling_gpu.cu:115-117). `seed0_fps()` patches torch.randint to
zeros for the duration of a reference forward so both sides run the CUDA
semantics.
"""

from __future__ import annotations

import contextlib
import importlib
import os
import pickle
import sys
import tempfile
import types
from unittest import mock

import numpy as np

REF_ROOT = "/root/reference"


@contextlib.contextmanager
def pushd(path):
    """os.chdir with restore — contextlib.chdir needs Python >= 3.11 while
    pyproject declares >= 3.10 (ADVICE r3)."""
    prev = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(prev)


def _install_chumpy_stub():
    if "chumpy" in sys.modules:
        return
    mod = types.ModuleType("chumpy")

    class Ch:  # base class for the reference's Rodrigues(ch.Ch)
        pass

    class _ChArray(np.ndarray):
        @property
        def r(self):
            return np.asarray(self)

    def array(x):
        return np.asarray(x, dtype=np.float64).view(_ChArray)

    mod.Ch = Ch
    mod.array = array
    mod.concatenate = np.concatenate
    mod.eye = np.eye
    sys.modules["chumpy"] = mod


def _install_empty(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)


def _patch_torch_cuda():
    import torch

    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self


def _install_open3d_stub():
    """Behavior-complete stub for the one open3d call the reference's DexYCB
    loader makes (DexYCB_dataset.py:96-109): PointCloud.create_from_depth_image
    on a float (metric) depth image with a stride — row-major back-projection
    of the non-zero strided pixels. Everything else stays an empty module."""
    if "open3d" in sys.modules and hasattr(sys.modules["open3d"], "geometry"):
        return
    o3d = types.ModuleType("open3d")
    geometry = types.ModuleType("open3d.geometry")
    camera = types.ModuleType("open3d.camera")

    class Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    class PinholeCameraIntrinsic:
        def __init__(self, w, h, fx, fy, cx, cy):
            self.w, self.h = w, h
            self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy

    class PointCloud:
        def __init__(self, pts):
            self.points = pts

        @staticmethod
        def create_from_depth_image(img, intr, stride=1):
            d = img.arr
            rows = np.arange(0, d.shape[0], stride)
            cols = np.arange(0, d.shape[1], stride)
            sub = d[np.ix_(rows, cols)]
            rr, cc = np.meshgrid(rows, cols, indexing="ij")
            m = sub > 0
            z = sub[m].astype(np.float64)
            x = (cc[m] - intr.cx) * z / intr.fx
            y = (rr[m] - intr.cy) * z / intr.fy
            return PointCloud(np.stack([x, y, z], axis=-1))

    geometry.Image = Image
    geometry.PointCloud = PointCloud
    camera.PinholeCameraIntrinsic = PinholeCameraIntrinsic
    o3d.geometry = geometry
    o3d.camera = camera
    sys.modules["open3d"] = o3d
    sys.modules["open3d.geometry"] = geometry
    sys.modules["open3d.camera"] = camera


def _setup():
    _install_chumpy_stub()
    _install_open3d_stub()
    for stub in ("plyfile", "trimesh"):
        _install_empty(stub)
    if "manopth" not in sys.modules:
        # The reference's DexYCB loader runs the real manopth ManoLayer
        # (DexYCB_dataset.py:284-285: use_pca=True, ncomps=45,
        # flat_hand_mean=False, millimeter outputs — hence its /1000 at
        # :149-156). This stub reproduces those manopth semantics on top of
        # the reference's OWN OurManoLayer: PCA+hands_mean pose mapping,
        # no wrist recentering (manopth center_idx=None), x1000 outputs.
        import torch

        manopth = types.ModuleType("manopth")
        manolayer = types.ModuleType("manopth.manolayer")

        class ManoLayer(torch.nn.Module):
            def __init__(self, mano_root, side="right", use_pca=True,
                         ncomps=45, flat_hand_mean=False, **kw):
                super().__init__()
                from third_party.mano.our_mano import OurManoLayer
                assert use_pca and ncomps == 45 and not flat_hand_mean
                self.inner = OurManoLayer(side=side, mano_root=mano_root)
                dd = self.inner.smpl_data
                self.comps = torch.tensor(
                    np.asarray(dd["hands_components"]), dtype=torch.float32)
                self.mean = torch.tensor(
                    np.asarray(dd["hands_mean"]), dtype=torch.float32)

            def forward(self, th_pose_coeffs, th_trans=None, th_betas=None):
                if th_trans is None:
                    th_trans = torch.zeros(th_pose_coeffs.shape[0], 3)
                full = torch.cat(
                    [th_pose_coeffs[:, :3],
                     th_pose_coeffs[:, 3:48].mm(self.comps) + self.mean], 1)
                kwargs = {}
                if th_betas is not None:
                    kwargs["th_betas"] = th_betas
                v, j = self.inner.forward(th_pose_coeffs=full,
                                          th_trans=th_trans,
                                          original_version=True, **kwargs)
                return v * 1000.0, j * 1000.0

        manolayer.ManoLayer = ManoLayer
        manopth.manolayer = manolayer
        sys.modules["manopth"] = manopth
        sys.modules["manopth.manolayer"] = manolayer
    if "transforms3d" not in sys.modules:
        # data_utils.mat_from_rvec needs axangles.axangle2mat — standard
        # Rodrigues, implemented here so the stub is behavior-complete
        t3d = types.ModuleType("transforms3d")
        ax = types.ModuleType("transforms3d.axangles")

        def axangle2mat(axis, angle, is_normalized=False):
            axis = np.asarray(axis, dtype=np.float64)
            if not is_normalized:
                n = np.linalg.norm(axis)
                axis = axis / n if n > 1e-12 else np.array([1.0, 0.0, 0.0])
            x, y, z = axis
            k = np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
            return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)

        ax.axangle2mat = axangle2mat
        t3d.axangles = ax
        sys.modules["transforms3d"] = t3d
        sys.modules["transforms3d.axangles"] = ax
    _install_empty("skimage")
    _install_empty("skimage.measure")
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    _patch_torch_cuda()
    for p in (REF_ROOT, os.path.join(REF_ROOT, "network"),
              os.path.join(REF_ROOT, "network", "models"),
              os.path.join(REF_ROOT, "datasets")):
        if p not in sys.path:
            sys.path.insert(0, p)


def reference_module(name: str):
    """Import a reference module by its flat in-repo name (e.g.
    'hand_network', 'pointnet_utils', 'optimization_obj',
    'third_party.mano.our_mano')."""
    _setup()
    if name in sys.modules:
        return sys.modules[name]
    if name in ("optimization_obj", "optimization_hand", "trainer"):
        # trainer imports track_network -> optimization_obj transitively
        # import-time np.load of data/YCB/CatPose2InsPose.npy relative to CWD
        scratch = tempfile.mkdtemp(prefix="hotrack_ref_")
        os.makedirs(os.path.join(scratch, "data", "YCB"), exist_ok=True)
        np.save(os.path.join(scratch, "data", "YCB", "CatPose2InsPose.npy"),
                {"placeholder": {"rotation": np.eye(3),
                                 "translation": np.zeros(3)}})
        cwd = os.getcwd()
        os.chdir(scratch)
        try:
            return importlib.import_module(name)
        finally:
            os.chdir(cwd)
    return importlib.import_module(name)


@contextlib.contextmanager
def seed0_fps():
    """Pin the reference's CPU FPS start index to 0 (CUDA-kernel semantics,
    sampling_gpu.cu:115-117) for the duration of a reference forward."""
    import torch

    real_randint = torch.randint

    def zeros(low, high, size, **kw):
        kw.setdefault("dtype", torch.long)
        kw.pop("device", None)
        return torch.zeros(size, dtype=kw["dtype"])

    with mock.patch.object(torch, "randint", zeros):
        yield
    assert torch.randint is real_randint


def write_fake_mano_pkl(dirpath: str, seed: int = 0) -> str:
    """Write MANO_RIGHT.pkl built from this package's synthetic rig so the
    reference's OurManoLayer and this package load the *same* model.

    Field layout mirrors the real asset as consumed by ready_arguments +
    OurManoLayer.__init__ (our_mano.py:39-70, 175-201): J_regressor is a
    scipy sparse matrix (`.toarray()` is called on it), everything else plain
    float arrays that the chumpy stub wraps.
    """
    import scipy.sparse as sp

    from hotrack_tpu.mano.model import KINTREE_PARENTS, synthetic_mano_model

    m = synthetic_mano_model(seed)
    kintree = np.stack([
        np.asarray(KINTREE_PARENTS, dtype=np.int64),
        np.arange(len(KINTREE_PARENTS), dtype=np.int64),
    ])
    dd = {
        "v_template": np.asarray(m.v_template, np.float64),
        "shapedirs": np.asarray(m.shapedirs, np.float64),
        "posedirs": np.asarray(m.posedirs, np.float64),
        "J_regressor": sp.csc_matrix(np.asarray(m.j_regressor, np.float64)),
        "weights": np.asarray(m.weights, np.float64),
        "hands_components": np.asarray(m.hands_components, np.float64),
        "hands_mean": np.zeros(m.hands_components.shape[1]),
        "f": np.asarray(m.faces, np.uint32),
        "kintree_table": kintree,
    }
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, "MANO_RIGHT.pkl")
    with open(path, "wb") as f:
        pickle.dump(dd, f)
    return path
