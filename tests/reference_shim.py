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
    torch.manual_seed(0)
