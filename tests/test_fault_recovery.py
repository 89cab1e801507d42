"""Fault injection + elastic recovery (SURVEY.md §5.3).

The reference's training loop has no failure handling of any kind
(denoise_sparse.py:45-78: no try/except, no persistence). This framework's
recovery story is synchronous-or-async orbax checkpoints + resume-by-step
(training/checkpoint.py). The test *injects a real fault*: a subprocess
trainer SIGKILLs itself mid-run right after a checkpoint lands, and a second
invocation must (a) resume from the latest checkpoint, and (b) reach a final
state bit-identical to an uninterrupted run (batches are keyed by step, so
exact recovery is the correctness contract — any drift means the checkpoint
missed state).
"""
import subprocess
import sys
from pathlib import Path

RUNNER = Path(__file__).with_name("_fault_runner.py")
STEPS = 6
KILL_AT = 2


def _run(ckpt_dir, kill_at=None, timeout=600):
    cmd = [sys.executable, str(RUNNER), "--ckpt-dir", str(ckpt_dir),
           "--steps", str(STEPS)]
    if kill_at is not None:
        cmd += ["--kill-at", str(kill_at)]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)


def _final_line(out: str) -> str:
    finals = [l for l in out.splitlines() if l.startswith("FINAL ")]
    assert finals, f"no FINAL line in output:\n{out}"
    return finals[-1]


def test_kill_and_resume_is_bit_exact(tmp_path):
    crashed_dir = tmp_path / "crashed"
    clean_dir = tmp_path / "clean"

    # run 1: killed mid-training by an injected SIGKILL
    r1 = _run(crashed_dir, kill_at=KILL_AT)
    assert r1.returncode == -9, (r1.returncode, r1.stdout, r1.stderr)
    assert f"KILLING at step {KILL_AT}" in r1.stdout
    assert "FINAL" not in r1.stdout  # it really died mid-run

    # run 2: restarted on the same checkpoint dir — must resume, not restart
    r2 = _run(crashed_dir)
    assert r2.returncode == 0, (r2.stdout, r2.stderr)
    assert f"RESUMED from step {KILL_AT}" in r2.stdout, r2.stdout

    # reference: uninterrupted run from scratch
    r3 = _run(clean_dir)
    assert r3.returncode == 0, (r3.stdout, r3.stderr)
    assert "RESUMED" not in r3.stdout

    # recovery is exact: same final loss to the last printed digit
    assert _final_line(r2.stdout) == _final_line(r3.stdout), (
        r2.stdout, r3.stdout)
