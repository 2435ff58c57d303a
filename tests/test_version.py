"""Version / build provenance (reference: tests/test_version.py,
src/C/version.cc, built_json.cu)."""

import json

import hpc_ops_tpu as hpc


def test_version():
    assert isinstance(hpc.__version__, str)
    major = hpc.__version__.split(".")[0]
    assert major.isdigit()


def test_built_json():
    info = json.loads(hpc.built_json())
    assert info["version"] == hpc.__version__
    assert "jax" in info and "backend" in info
