"""Multi-host (DCN) dryrun — executes jax.distributed.initialize for real.

Skipped by default: it spawns 3 subprocesses (a single-process reference +
2 distributed controllers), each paying a full jit of the train step, which
is minutes of cold-cache CPU work. Run with SMM_MULTIHOST=1. The driver-
facing entry is ``__graft_entry__.dryrun_multihost`` (also:
``python __graft_entry__.py --multihost``).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.skipif(os.environ.get("SMM_MULTIHOST") != "1",
                    reason="multi-process dryrun is opt-in: SMM_MULTIHOST=1")
def test_multihost_dryrun_matches_single_process():
    from __graft_entry__ import dryrun_multihost

    # 2 controllers x 2 virtual CPU devices -> one global (2, 2) mesh;
    # asserts each controller's loss equals the single-process 4-device run
    dryrun_multihost(num_processes=2, local_devices=2)
