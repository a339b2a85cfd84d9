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


def test_published_model_commands_parse():
    """Every command line published in the reference's models/README.md (the
    exact argvs for the 0006/0010/0028/0031/0042/0102 result rows) must parse
    against our drivers — a reference user's documented invocations work
    verbatim."""
    readme = os.path.join(REF_ROOT, "models", "README.md")
    if not os.path.exists(readme):
        pytest.skip("reference checkout not present")
    with open(readme) as f:
        cmds = [line.strip() for line in f if line.strip().startswith("python ")]
    assert len(cmds) >= 7

    for cmd in cmds:
        parts = cmd.split()
        script = parts[1]
        mod = importlib.import_module(
            "tennis_tpu." + script.removesuffix(".py"))
        fv = mod.FLAGS
        try:
            fv.unparse_flags()
            leftover = fv([script] + parts[2:])
        except Exception as e:
            raise AssertionError(f"{cmd!r} failed to parse: {e}") from e
        assert leftover == [script], f"{cmd!r} left unparsed args {leftover[1:]}"
        fv.unparse_flags()


def test_rdnet_remat_flag_wiring():
    """--backbone rdnet --remat block reaches R21D(remat=True); hires/growth
    stay DenseNet-only."""
    from absl import flags

    from tennis_tpu import train as train_driver

    fv = flags.FLAGS
    fv.unparse_flags()
    fv(["train.py", "--backbone=rdnet", "--window=8", "--remat=block"])
    model = train_driver.build_model(num_classes=5, feats=False)
    assert model.backbone.remat is True
    fv.unparse_flags()
    fv(["train.py", "--backbone=rdnet", "--window=8", "--remat=hires"])
    with pytest.raises(ValueError, match="rdnet supports --remat block"):
        train_driver.build_model(num_classes=5, feats=False)
    fv.unparse_flags()
    fv(["train.py", "--backbone=resnet18_v2", "--remat=block"])
    with pytest.raises(ValueError, match="DenseNet and rdnet"):
        train_driver.build_model(num_classes=5, feats=False)
    fv.unparse_flags()


def test_empty_feats_model_is_pixels_path():
    """``--feats_model=`` (empty-string clearing, the repo convention used by
    e.g. --emb_file=) must select the pixels path everywhere: build_model gets
    a CNN src_embed, matching make_datasets' ``FLAGS.feats_model or None``."""
    from tennis_tpu import train_gnmt as tg

    tg.FLAGS.unparse_flags()
    tg.FLAGS(["train_gnmt.py", "--feats_model=", "--backbone=resnet18_v2",
              "--num_hidden=8", "--emb_size=8"])
    model = tg.build_model(vocab_size=16)
    assert model.src_embed is not None
    tg.FLAGS.unparse_flags()
    tg.FLAGS(["train_gnmt.py", "--feats_model=t1"])
    assert tg.build_model(vocab_size=16).src_embed is None
