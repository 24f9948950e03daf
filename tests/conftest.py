import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path; benches run on the real chip).  Set DCP_TEST_TPU=1 to
# keep the ambient TPU backend instead — tests/test_tpu_hw.py (hardware
# boundary-shape parity) only runs in that mode; most CPU-mesh tests
# will then skip or fail on device count and should be deselected:
#   DCP_TEST_TPU=1 pytest tests/test_tpu_hw.py -v
#
# NB: this environment preloads jax at interpreter startup (sitecustomize)
# with JAX_PLATFORMS pinned to the TPU tunnel, so plain env vars are too
# late here — use jax.config before any backend is initialized.
if os.environ.get("DCP_TEST_TPU", "") in ("", "0"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
