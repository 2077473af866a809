"""Test config: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4).  Set CAMA_TPU_TESTS=1 to keep
the ambient (real TPU) backend instead and run the on-chip lane:
CAMA_TPU_TESTS=1 python -m pytest tests/ -m tpu."""
import os
import sys

TPU_LANE = os.environ.get("CAMA_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override: ambient env pins a TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    # the baked sitecustomize force-registers the TPU platform and overrides
    # JAX_PLATFORMS via jax config; undo that before any backend initializes
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "cama"))


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
