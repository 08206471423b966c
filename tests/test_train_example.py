"""End-to-end features->classifier integration (the A1 input-layer role)."""

import subprocess
import sys


def test_phone_classifier_learns():
    out = subprocess.run(
        [sys.executable, "examples/train_phone_classifier.py", "--cpu",
         "--steps", "80", "--n-per-class", "12"],
        capture_output=True, text=True, timeout=300, cwd=".",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("final test")]
    assert last, out.stdout
    acc = float(last[0].split()[-3])
    assert acc > 0.5, f"classifier failed to learn: {last[0]}"
