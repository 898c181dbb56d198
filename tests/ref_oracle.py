"""Load the reference repo's pure-torch oracle module for parity testing.

We import ``/root/reference/gsplat/cuda/_torch_impl.py`` standalone (it only
needs torch-cpu at module scope). This gives byte-exact parity targets for
projection / SH / isect math without copying any reference code into this
repo. Tests degrade gracefully (skip) if the reference checkout is absent.
"""

import importlib.util
import os

import pytest

_REF = "/root/reference/gsplat/cuda/_torch_impl.py"
_REF_2DGS = "/root/reference/gsplat/cuda/_torch_impl_2dgs.py"


def load_ref_oracle(path=_REF, name="ref_torch_impl"):
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_ref_oracle_2dgs():
    return load_ref_oracle(_REF_2DGS, "ref_torch_impl_2dgs")
