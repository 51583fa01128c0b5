"""Load the UNTRUSTED read-only reference implementation as a CPU parity
oracle for tests.

The reference torch code hard-codes `.cuda()` calls (e.g. stereo_net.py:177);
we monkeypatch tensor/module `.cuda()` to no-ops so its numerics can be
evaluated on CPU and compared against our JAX implementations. Nothing from
the reference is copied into the framework — tests import it in place.

Skips cleanly (REFERENCE_AVAILABLE=False) if the mount is missing.
"""

from __future__ import annotations

import os
import sys

REFERENCE_ROOT = "/root/reference"
REFERENCE_AVAILABLE = os.path.isdir(os.path.join(REFERENCE_ROOT, "adaptive_stereo"))

if REFERENCE_AVAILABLE:
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import torch

    def _identity_cuda(self, *args, **kwargs):
        return self

    torch.Tensor.cuda = _identity_cuda
    torch.nn.Module.cuda = _identity_cuda

    # The reference also moves tensors with .to(torch.device("cuda"))
    # (adapt.py:242 via linear_warping.py:13); map cuda targets to cpu.
    _orig_tensor_to = torch.Tensor.to

    def _cpu_mapped_to(self, *args, **kwargs):
        def _map(a):
            if isinstance(a, torch.device) and a.type == "cuda":
                return "cpu"
            if isinstance(a, str) and a.startswith("cuda"):
                return "cpu"
            return a

        args = tuple(_map(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _map(kwargs["device"])
        return _orig_tensor_to(self, *args, **kwargs)

    torch.Tensor.to = _cpu_mapped_to
    torch.manual_seed(0)

    # --- minimal stubs for reference deps absent from this image ---------
    # (test glue only; lets reference train.py/adapt.py/stereo_dataset.py
    # import so the lockstep harness can drive the real engine loop)
    import types

    if "git" not in sys.modules:
        try:
            import git  # noqa: F401
        except ImportError:
            _git = types.ModuleType("git")

            class _Head:
                class object:  # noqa: N801 - mimics gitpython attr chain
                    hexsha = "unavailable (gitpython stub)"

            class _Repo:
                def __init__(self, *a, **k):
                    self.head = _Head()

            _git.Repo = _Repo
            sys.modules["git"] = _git

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            import numpy as _np
            _tv = types.ModuleType("torchvision")
            _tf = types.ModuleType("torchvision.transforms")

            class _ToTensor:
                """PIL/ndarray -> CHW float tensor in [0,1] (the subset of
                torchvision.transforms.ToTensor the reference uses)."""

                def __call__(self, pic):
                    arr = _np.asarray(pic)
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    t = torch.from_numpy(
                        _np.ascontiguousarray(arr.transpose(2, 0, 1)))
                    if t.dtype == torch.uint8:
                        t = t.float() / 255.0
                    return t

            class _RandomCrop:
                @staticmethod
                def get_params(img, output_size):
                    raise NotImplementedError(
                        "torchvision stub: random_crop unsupported")

            _tf.ToTensor = _ToTensor
            _tf.RandomCrop = _RandomCrop
            _tv.transforms = _tf
            sys.modules["torchvision"] = _tv
            sys.modules["torchvision.transforms"] = _tf
