"""The north_rule resumability claim, tested with a REAL kill: a
subprocess encode run is SIGKILLed mid-flight; the resumed run must skip
every completed partition and the final output must be bit-identical."""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent("""
    import json, sys
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False,
             logging_level="ERROR")
    from nailray.context import configure; configure()
    from nailray.encode import pipeline as epl
    s = epl.encode_dataset(sys.argv[1], sys.argv[2],
                           target_partition_bytes=96 << 10,
                           chunk_rows=400, chunk_bytes=1 << 20)
    print("DONE " + json.dumps({k: s[k] for k in
          ("partitions", "newly_encoded", "resumed_skipped")}), flush=True)
    ray.shutdown()
""")


def _manifest_count(out: str) -> int:
    mdir = os.path.join(out, "_manifest")
    return len([f for f in os.listdir(mdir) if f.endswith(".json")]) \
        if os.path.isdir(mdir) else 0


def test_kill_mid_run_then_resume(corpus_dir, tmp_path):
    out = str(tmp_path / "enc")
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.Popen([sys.executable, "-c", SCRIPT, corpus_dir, out],
                         env=env, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True,
                         start_new_session=True)
    # wait until SOME partitions are complete, then SIGKILL the whole group
    killed_mid_run = False
    deadline = time.time() + 240
    while time.time() < deadline:
        n = _manifest_count(out)
        if p.poll() is not None:
            break  # finished before we could kill — fall through
        if 1 <= n:
            os.killpg(p.pid, signal.SIGKILL)
            killed_mid_run = True
            break
        time.sleep(0.05)
    p.wait(timeout=60)
    done_before_kill = not killed_mid_run and p.poll() == 0
    n_before = _manifest_count(out)

    # resume in a fresh process
    r = subprocess.run([sys.executable, "-c", SCRIPT, corpus_dir, out],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("DONE ")][-1]
    summary = json.loads(line[len("DONE "):])
    if done_before_kill:
        pytest.skip("first run finished before the kill landed")
    assert summary["resumed_skipped"] >= max(n_before - 1, 0)
    assert summary["resumed_skipped"] + summary["newly_encoded"] >= summary["partitions"]

    # the resumed output must still be bit-identical to the input
    check = textwrap.dedent(f"""
        import ray
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 logging_level="ERROR")
        from nailray.context import configure; configure()
        from nailray.encode import pipeline as epl
        print("MATCH", epl.verify_bit_identity({corpus_dir!r}, {out!r})["match"])
        ray.shutdown()
    """)
    r2 = subprocess.run([sys.executable, "-c", check], env=env, cwd=REPO,
                        capture_output=True, text=True, timeout=420)
    assert "MATCH True" in r2.stdout, r2.stderr[-2000:]
