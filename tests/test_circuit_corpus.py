"""Circuit behavioral golden-corpus regression test.

Mirrors the reference's differential-behavior harness
(test/performance/circuit_corpus.py + circuit_corpus_baseline.jsonl.gz):
regenerate fingerprints for ~26k realistic circuits (GST designs at 1Q/2Q
with int and string qubit labels, random 2Q circuits, re-parsed samples)
and demand byte-level agreement with the committed baseline, modulo an
explicit human-readable allowlist.

Runs the corpus CLI in a subprocess so PYTHONHASHSEED=0 pins the raw
`hash` fingerprints too.
"""

import os
import subprocess
import sys

import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
CORPUS_CLI = os.path.join(TESTS_DIR, 'circuit_corpus.py')
BASELINE = os.path.join(TESTS_DIR, 'circuit_corpus_baseline.jsonl.gz')
ALLOWLIST = os.path.join(TESTS_DIR, 'circuit_corpus_allowlist.txt')


@pytest.mark.slow
def test_circuit_corpus_matches_baseline(tmp_path):
    assert os.path.exists(BASELINE), \
        "no committed baseline; run: python tests/circuit_corpus.py generate " \
        "--out tests/circuit_corpus_baseline.jsonl.gz --size full"
    candidate = str(tmp_path / 'candidate.jsonl.gz')
    env = dict(os.environ, PYTHONHASHSEED='0', JAX_PLATFORMS='cpu')
    gen = subprocess.run(
        [sys.executable, CORPUS_CLI, 'generate', '--out', candidate,
         '--size', 'full'],
        capture_output=True, text=True, env=env, timeout=900)
    assert gen.returncode == 0, gen.stdout + gen.stderr
    cmd = [sys.executable, CORPUS_CLI, 'compare', BASELINE, candidate]
    if os.path.exists(ALLOWLIST):
        cmd += ['--allowlist', ALLOWLIST]
    cmp_ = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=300)
    assert cmp_.returncode == 0, \
        "circuit behavior diverged from golden corpus:\n" + cmp_.stdout[-8000:]
