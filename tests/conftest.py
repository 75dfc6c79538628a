"""Test harness setup: force CPU with 8 virtual devices.

Multi-chip sharding is exercised without TPU hardware via XLA's
host-platform device-count trick; all tests use tiny shapes so the suite
runs in CI on any box.

NOTE: some environments preload jax via sitecustomize with a TPU plugin and
``JAX_PLATFORMS`` already pointing at it — by the time conftest runs, env
edits are too late, so the platform is forced through ``jax.config``.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Single-core CI hosts: per-device Eigen thread pools thrash the scheduler.
os.environ.setdefault("OMP_NUM_THREADS", "1")

# keep per-platform caches separate: entries compiled for another host's CPU
# features (e.g. by a remote compile service) SIGILL-risk on replay
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_config(tmp_path_factory):
    """A small-but-real ModelConfig for fast tests."""
    from simple_multimodal_tpu.config import ModelConfig

    base = tmp_path_factory.mktemp("cfg")
    return ModelConfig(
        text_max_length=16,
        audio_max_length=3200,
        video_max_frames=4,
        video_frame_size=(32, 32),
        fusion_hidden_size=32,
        fusion_num_heads=4,
        graph_hidden_size=16,
        adapter_size=8,
        prompt_length=4,
        batch_size=2,
        encoder_preset="tiny",
        data_path=str(base / "data"),
        save_path=str(base / "ckpt"),
        log_path=str(base / "logs"),
    )


@pytest.fixture(autouse=True)
def _reset_ambient_mesh():
    """make_mesh registers an ambient mesh that the Pallas kernels
    shard_map over; don't let one test's mesh leak into the next."""
    yield
    from simple_multimodal_tpu.parallel.mesh import set_current_mesh

    set_current_mesh(None)
