"""Round-9 advisor item: the registry index queries (q152/q153/q154/
q156) build per-invocation indexes under ``/tmp/nocnetintel_*``. Those
paths must outlive the query FUNCTION (the returned DataFrame reads the
index lazily) but must NOT outlive the driver PROCESS — a sequence of
short-lived drivers previously accumulated tmp debris until OS cleanup
(round-8 VERDICT "what's wrong" item 2). The fix registers an atexit
rmtree per path (plans/queries_r10.py:_scratch_index_path).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from .conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import hashlib
import os
import sys
import tempfile

sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]

from mysoftware_nocnetintel_spark.session import get_spark
from mysoftware_nocnetintel_spark.plans.queries_r10 import q153_ann_index

spark = get_spark(app_name="scratch-hygiene-child", shuffle_partitions=4)
rows = q153_ann_index(spark, sf_dir).collect()
assert rows, "q153 returned no rows in the hygiene child"

tag = hashlib.md5(
    f"{os.path.abspath(sf_dir)}:{os.getpid()}".encode()
).hexdigest()[:12]
path = os.path.join(tempfile.gettempdir(), f"nocnetintel_ann_index_{tag}")
# while the process is alive the lazily-read index must still exist
assert os.path.isdir(path), f"index path missing mid-process: {path}"
print("SCRATCH_PATH=" + path, flush=True)
spark.stop()
# normal interpreter exit -> atexit rmtree fires
"""


@pytest.mark.slow
def test_index_scratch_paths_removed_at_process_exit(tmp_path):
    """A fresh driver process that runs q153 end-to-end (build + serve +
    collect) leaves no ``/tmp/nocnetintel_*`` directory behind after it
    exits, while the path stays readable for the whole process life."""
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    proc = subprocess.run(
        [sys.executable, str(script), REPO, SF_DIR],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    marker = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("SCRATCH_PATH=")
    ]
    assert marker, proc.stdout[-2000:]
    path = marker[0].split("=", 1)[1]
    assert not os.path.exists(path), (
        f"scratch index path survived process exit: {path}"
    )


def test_scratch_helper_registers_atexit(monkeypatch, tmp_path):
    """In-process check of the helper contract: the path is cleared on
    entry (stale same-PID debris) and an atexit rmtree is registered for
    exactly that path."""
    import atexit
    import shutil

    from mysoftware_nocnetintel_spark.plans import queries_r10 as R10

    registered = []

    def fake_register(fn, *a, **kw):
        registered.append((fn, a, kw))
        return fn

    monkeypatch.setattr(atexit, "register", fake_register)
    monkeypatch.setattr(
        "tempfile.gettempdir", lambda: str(tmp_path)
    )
    stale = None
    path = R10._scratch_index_path("hygiene_unit", str(tmp_path))
    # entry-clearing: pre-create debris at the same path, call again
    os.makedirs(path, exist_ok=True)
    stale = os.path.join(path, "stale.bin")
    with open(stale, "wb") as fh:
        fh.write(b"x")
    path2 = R10._scratch_index_path("hygiene_unit", str(tmp_path))
    assert path2 == path
    assert not os.path.exists(stale)
    assert any(
        fn is shutil.rmtree and a and a[0] == path for fn, a, kw in registered
    ), registered
