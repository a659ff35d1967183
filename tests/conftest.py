"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on host-platform virtual devices (SURVEY.md §7 step 8). Must run before jax
initializes a backend; the axon sitecustomize pre-registers a TPU platform, so
we also override jax_platforms explicitly.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import iifea_tpu  # noqa: E402,F401  (enables x64)

REF_MESHES = "/root/reference/meshes"


def ref_mesh_path(*parts: str) -> str:
    return os.path.join(REF_MESHES, *parts)
