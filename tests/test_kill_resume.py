"""Kill-mid-build resume (SURVEY §7.5 item 7): a build process SIGKILLed
mid-flight must resume from its per-partition checkpoints and produce an
index identical to an uninterrupted build."""

import os
import signal
import subprocess
import sys
import time

import pytest

BUILD_SCRIPT = """
import sys, ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, {repo!r})
from poseidon_ray.pipelines.build import build_index
from poseidon_ray.schema import IndexSpec
spec = IndexSpec(num_partitions=6, static_hot_terms=("return", "if"))
build_index({corpus!r}, {out!r}, spec)
print("BUILD_DONE")
"""


def test_kill_mid_build_then_resume(ray_session, small_corpus_path, tmp_path):
    from poseidon_ray.pipelines.build import build_index
    from poseidon_ray.pipelines.query import Searcher
    from poseidon_ray.schema import IndexSpec

    spec = IndexSpec(num_partitions=6, static_hot_terms=("return", "if"))
    interrupted = str(tmp_path / "killed")
    clean = str(tmp_path / "clean")

    # launch a separate build process and SIGKILL it mid-build
    code = BUILD_SCRIPT.format(repo="/root/repo", corpus=small_corpus_path,
                               out=interrupted)
    env = dict(os.environ, RAY_ADDRESS="")
    proc = subprocess.Popen([sys.executable, "-c", code], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        # kill as soon as the docstore checkpoint exists but before the
        # index completes (mid-pipeline)
        if os.path.exists(os.path.join(interrupted, "docstore.json")) and \
                not os.path.exists(os.path.join(interrupted, "index.json")):
            time.sleep(0.5)
            if proc.poll() is None:
                proc.send_signal(signal.SIGKILL)
                killed = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    proc.wait(timeout=60)
    if not killed and proc.returncode == 0:
        pytest.skip("build finished before it could be killed (too fast)")
    assert not os.path.exists(os.path.join(interrupted, "index.json"))

    # resume IN THIS session: must complete from checkpoints
    manifest = build_index(small_corpus_path, interrupted, spec)
    assert manifest["num_docs"] == 1200

    # identical to an uninterrupted build
    build_index(small_corpus_path, clean, spec)
    si, sc = Searcher(interrupted), Searcher(clean)
    for term in ["return", "error", "timeout", "parse_line"]:
        assert si.term_stats("content", term) == sc.term_stats("content", term)
    for q, mode in [("return error", "and"), ("lucene engine", "or")]:
        assert si.search(q, mode=mode, k=100) == sc.search(q, mode=mode, k=100)
