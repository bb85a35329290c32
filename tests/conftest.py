"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (see SURVEY.md §4 test plan).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin (sitecustomize in /root/.axon_site) force-registers the
# TPU backend and sets jax_platforms="axon,cpu" at interpreter startup,
# overriding the env var — override it back before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Tier markers: anything not marked ``slow``/``e2e`` is ``fast``.

    ``pytest -m fast`` is the <5-min iteration signal on a 1-core host;
    ``-m "slow or e2e"`` is the long tail; no ``-m`` runs everything
    (SURVEY §4 test plan, fast-tier requirement).
    """
    for item in items:
        if not any(m.name in ("slow", "e2e") for m in item.iter_markers()):
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_sphere_mesh(n_theta=48, n_phi=96, radius=0.7, center=(0.0, 0.0, 0.0)):
    """UV-sphere triangle mesh for analytic-SDF fixtures."""
    thetas = np.linspace(0, np.pi, n_theta)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for t in thetas:
        for p in phis:
            verts.append(
                (
                    center[0] + radius * np.sin(t) * np.cos(p),
                    center[1] + radius * np.sin(t) * np.sin(p),
                    center[2] + radius * np.cos(t),
                )
            )
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append((a, b, c))
            faces.append((b, d, c))
    return verts, np.asarray(faces, np.int32)


@pytest.fixture
def sphere_mesh():
    return make_sphere_mesh()
