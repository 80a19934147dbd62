"""bench.py output contract under a simulated remote-compile stall.

The driver parses bench.py's stdout for a JSON line and kills the process
on timeout; round 1 lost its BENCH artifact to a cold-compile stall. The
contract: if the measurement hasn't landed by SWR_BENCH_DEADLINE, a
partial-but-parseable line is emitted immediately (so a later SIGKILL
still leaves valid stdout), and the real line — with a "compile_s" field —
follows if the stall resolves.
"""

import json
import os
import subprocess
import sys


def test_bench_emits_partial_line_on_stall_then_real_line():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        # tiny CPU config so the real run finishes in seconds
        "SWR_BATCH": "32", "SWR_SCAN": "2", "SWR_STEPS": "4",
        "SWR_VOCAB": "100", "SWR_TIME_BUDGET": "2",
        # stall 3 s in the "compiling" stage; deadline fires at 1 s
        "SWR_TEST_STALL_S": "3", "SWR_BENCH_DEADLINE": "1",
        "SWR_PROD": "0",
    })
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import bench; bench.main()"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 2, out.stdout
    partial, real = lines
    assert partial["partial"] is True
    assert partial["stage"] == "compiling"
    assert partial["value"] == 0.0
    # the partial line's metric name can never collide with the real one,
    # so a first-line parser cannot record 0.0 as the measurement (ADVICE r3)
    assert partial["metric"].endswith("_partial")
    assert real.get("partial") is None
    assert real["metric"] + "_partial" == partial["metric"]
    assert real["value"] > 0
    assert "compile_s" in real
    assert real["unit"] == "examples/s/chip"


def test_bench_normal_run_emits_single_line():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "SWR_BATCH": "32", "SWR_SCAN": "2", "SWR_STEPS": "4",
        "SWR_VOCAB": "100", "SWR_TIME_BUDGET": "2",
        # tiny "production" shape so the second measurement runs on CPU;
        # the real default is 467k (VERDICT r3 #2: both shapes must reach
        # the driver's BENCH artifact in ONE line)
        "SWR_PROD_VOCAB": "300",
        # tiny production batch for the third (batch-scaling) measurement
        # (VERDICT r4 #8: the documented production batch reaches the
        # driver artifact too)
        "SWR_PROD_BIG_BATCH": "64",
    })
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import bench; bench.main()"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    assert lines[0]["value"] > 0 and "compile_s" in lines[0]
    prod = lines[0]["prod_vocab"]
    assert prod["vocab"] == 300 and prod["impl"] == "sorted"
    assert prod["value"] > 0 and "compile_s" in prod
    big = lines[0]["prod_vocab_b64"]
    assert big["vocab"] == 300 and big["impl"] == "sorted"
    assert big["batch"] == 64
    assert big["value"] > 0 and "compile_s" in big
