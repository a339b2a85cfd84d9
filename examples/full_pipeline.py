"""The complete TenniSet workflow, end to end, on one dataset root.

Mirrors the reference's published experiment chain (models/README.md):
  1. train the framewise classifier            (reference model 0006)
  2. dump backbone features from the best epoch
  3. train CNN-RNN on the dumped features      (reference model 0042)
  4. evaluate with the overlay video
  5. train word embeddings                     (train_embeddings.py)
  6. train + evaluate the captioner on feats   (reference model 0102)
  7. two-stream RGB+flow classifier            (reference model 0010)
  8. R(2+1)D clip classifier                   (reference model 0031)

Stage 7 needs flow images under <root>/flow (data/process.py generates them)
and is skipped with a notice when the flow dir is missing; stage 8 trains on
RGB clips and runs either way.

Usage: ``python examples/full_pipeline.py --root <dataset root> [--small]``
(--small uses tiny shapes/epochs for smoke-testing on CPU).
"""
from __future__ import annotations

import argparse
import sys


def run(root: str, small: bool = False):
    from absl import app

    from tennis_tpu import evaluate as evaluate_driver
    from tennis_tpu import train as train_driver
    from tennis_tpu.evaluate_gnmt import main as evaluate_gnmt
    from tennis_tpu.train_embeddings import main as train_embeddings
    from tennis_tpu.train_gnmt import main as train_gnmt

    if small:
        vision = ["--data_shape=32", "--backbone=resnet18_v2", "--batch_size=8",
                  "--epochs=2", "--log_interval=5", "--num_workers=4"]
        cap = ["--num_hidden=32", "--emb_size=16", "--batch_size=4",
               "--test_batch_size=4", "--num_buckets=2", "--tgt_max_len=12",
               "--epochs=3", "--log_interval=5"]
        emb = ["--emb_size=16", "--epochs=1", "--batch_size=8"]
    else:
        vision = ["--backbone=DenseNet121", "--batch_size=64", "--epochs=20"]
        cap = ["--num_hidden=256", "--epochs=40"]
        emb = []

    def run_app(main, argv):
        from absl import flags

        # absl flags are process-global: reset them between stages so a flag set
        # by one stage (e.g. --save_feats) doesn't leak into the next
        flags.FLAGS.unparse_flags()
        try:
            app.run(main, argv=argv)
        except SystemExit:
            pass

    print("== 1. framewise classifier (0006)")
    run_app(train_driver.main,
            ["train", f"--root={root}", "--model_id=0006"] + vision)

    print("== 2. feature dump from the best epoch")
    run_app(train_driver.main,
            ["train", f"--root={root}", "--model_id=0006", "--save_feats"]
            + vision)

    window = "--window=5" if small else "--window=15"
    print("== 3. CNN-RNN on features (0042)")
    run_app(train_driver.main,
            ["train", f"--root={root}", "--model_id=0042",
             "--feats_model=0006", "--temp_pool=gru", window] + vision)

    print("== 3b. temporal-pooling final test (0028: no training, donor wrap)")
    run_app(train_driver.main,
            ["train", f"--root={root}", "--model_id=0028",
             "--feats_model=0006", "--temp_pool=mean", window] + vision)

    print("== 4. evaluate with overlay video")
    run_app(evaluate_driver.main,
            ["evaluate", f"--root={root}", "--model_id=0006", "--vis"] + vision)

    print("== 5. word embeddings")
    train_embeddings(["train_embeddings", f"--root={root}", "--noadd_extra",
                      "--notsne", "--overwrite"] + emb)

    print("== 6. captioner on features (0102)")
    train_gnmt(["train_gnmt", f"--root={root}", "--model_id=0102",
                "--feats_model=0006", "--emb_file=embeddings.txt"] + cap)
    evaluate_gnmt(["evaluate_gnmt", f"--root={root}", "--model_id=0102",
                   "--feats_model=0006", "--emb_file=embeddings.txt", "--force"]
                  + cap)

    import os
    if os.path.isdir(os.path.join(root, "flow")):
        print("== 7. two-stream RGB+flow classifier (0010)")
        run_app(train_driver.main,
                ["train", f"--root={root}", "--model_id=0010", "--flow=twos"]
                + vision)
    else:
        print(f"== 7. SKIPPED two-stream (no {root}/flow — run "
              "data/process.py first)")

    print("== 8. R(2+1)D clip classifier (0031)")
    rd = ["--backbone=rdnet", "--window=8"] + [
        a for a in vision if not a.startswith("--backbone")
    ] + (["--num_devices=1"] if small else [])
    run_app(train_driver.main,
            ["train", f"--root={root}", "--model_id=0031"] + rd)
    print("== pipeline complete")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="data")
    parser.add_argument("--small", action="store_true")
    args = parser.parse_args()
    run(args.root, args.small)
