"""The reference drivers' absl flag surfaces must parse against ours.

Every ``flags.DEFINE_*`` name in the reference drivers (reference
train.py:32-93, evaluate.py:30-75, train_gnmt.py:48-119,
evaluate_gnmt.py:42-88) must be accepted by the corresponding tennis_tpu
driver, so a reference user's command line works unchanged. Aliases count
(``--num_gpus`` maps to ``--num_devices``). Skips when the reference
checkout is absent.
"""
import importlib
import os
import re

import pytest

REF_ROOT = "/root/reference"

PAIRS = [
    ("train.py", "tennis_tpu.train"),
    ("evaluate.py", "tennis_tpu.evaluate"),
    ("train_gnmt.py", "tennis_tpu.train_gnmt"),
    ("evaluate_gnmt.py", "tennis_tpu.evaluate_gnmt"),
    ("train_embeddings.py", "tennis_tpu.train_embeddings"),
]

_DEFINE = re.compile(r'DEFINE_\w+\(\s*[\'"](\w+)[\'"]')


@pytest.mark.parametrize("ref_file,module_name", PAIRS)
def test_reference_flags_covered(ref_file, module_name):
    path = os.path.join(REF_ROOT, ref_file)
    if not os.path.exists(path):
        pytest.skip(f"reference checkout not present at {path}")
    with open(path) as f:
        ref_names = _DEFINE.findall(f.read())
    mod = importlib.import_module(module_name)
    missing = [n for n in ref_names if n not in mod.FLAGS]
    assert not missing, (
        f"{module_name} is missing reference flags {missing} "
        f"(defined in {path})"
    )
