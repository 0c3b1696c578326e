import os
import subprocess
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware; bench/CLI use the real chip instead.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_SRC = "/root/reference"
REF_BUILD = "/root/build/reference"
REF_BIN = os.path.join(REF_BUILD, "bsalign")


@pytest.fixture(scope="session")
def ref_bin():
    """Compile the reference bsalign binary once (parity ground truth)."""
    if not os.path.exists(REF_BIN):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference source not available")
        os.makedirs(REF_BUILD, exist_ok=True)
        subprocess.run(f"cp -r {REF_SRC}/* {REF_BUILD}/", shell=True, check=True)
        subprocess.run(["make"], cwd=REF_BUILD, check=True,
                       capture_output=True)
    return REF_BIN
