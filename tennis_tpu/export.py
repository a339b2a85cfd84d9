"""Ahead-of-time exporter: a trained experiment → one serialized StableHLO
artifact, loadable for serving WITHOUT the model code.

No reference counterpart (the reference serves straight from its training
stack); this is the deployment-side completion of the inference layer —
``tennis_tpu.inference`` builds the live jitted scorers, this module freezes
the SAME device programs through ``jax.export`` into versioned,
platform-tagged binaries plus JSON sidecars. Two artifact kinds:

- ``vision-classifier``: fused uint8→normalize→bf16 forward→softmax,
  best-epoch params baked in as constants; sidecar carries classes, shapes,
  provenance. ``load_exported`` rebuilds the scorer from the two files alone.
- ``captioner``: the full GNMT beam-search while_loop (encode → Luong-attention
  decode, beam 4 / GNMT length penalty) with ``valid_best.params`` baked in;
  sidecar carries the vocabulary + BOS/EOS ids so ``load_exported_captioner``
  reconstructs token-list captions with zero model code.

Either way the serving fleet ships two files — no flax module tree, no
checkpoint template, no flag surface (``tennis_tpu.serve --from_export`` /
``--caption_from_export`` boot straight from them).

CLI (flags mirror the documented evaluation surface):

    python -m tennis_tpu.export --model_id 0006 --backbone DenseNet121 \
        --batch_size 8 --platforms tpu,cpu --out 0006.hlo
    python -m tennis_tpu.export --kind captioner --model_id 0102 \
        --gnmt_flag=--feats_model=0006 --batch_size 4 --src_max_len 128

Export is shape-static by design (XLA compiles one program per geometry):
pick the serving batch size here; the HTTP layer's request coalescing
(tennis_tpu.serve) pads to a fixed batch for exactly this reason.
"""
from __future__ import annotations

import json
import os

import numpy as np
from absl import logging

_META_SUFFIX = ".json"
_FORMAT_VERSION = 1


def export_classifier(backbone: str, model_id: str, data_shape: int,
                      batch_size: int, root: str = "data",
                      platforms=None):
    """Freeze the experiment's best epoch into (serialized_bytes, meta).

    The exported callable maps a uint8 image batch (B, S, S, 3) to f32
    softmax probabilities (B, num_classes); params/batch-stats are baked in
    as program constants so the artifact is self-contained.

    ``platforms``: lowering platforms tuple (e.g. ``("tpu", "cpu")``);
    defaults to jax's current default backend.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.inference import load_classifier_state

    classes, model, state, info = load_classifier_state(
        backbone, model_id, data_shape, root)
    params, batch_stats = state.params, state.batch_stats

    def scorer(images):
        x = device_prepare(images)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.softmax(logits, axis=-1).astype(jnp.float32)

    spec = jax.ShapeDtypeStruct((batch_size, data_shape, data_shape, 3),
                                jnp.uint8)
    exp = jexport.export(jax.jit(scorer),
                         platforms=tuple(platforms) if platforms else None)(
        spec)
    blob = exp.serialize()
    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": "vision-classifier",
        "backbone": backbone,
        "model_id": model_id,
        "classes": list(classes),
        "batch_size": int(batch_size),
        "data_shape": int(data_shape),
        "input": {"shape": [batch_size, data_shape, data_shape, 3],
                  "dtype": "uint8"},
        "output": {"shape": [batch_size, len(classes)], "dtype": "float32"},
        "platforms": list(exp.platforms),
        "epoch": int(info["epoch"]),
        "score": None if info["score"] is None else float(info["score"]),
        "exp_dir": info["exp_dir"],
    }
    return blob, meta


def export_captioner(model_id: str, batch_size: int, src_max_len: int = 128,
                     root: str = "data", gnmt_argv=(), platforms=None,
                     use_pallas_gru: bool = False):
    """Freeze a captioning experiment's beam decode into (serialized, meta).

    The exported callable maps a float32 feature batch (B, src_max_len, D) +
    int32 valid lengths (B,) to ``(samples (B, K, L) int32, scores (B, K)
    f32, valid_length (B, K) i32)`` — the full beam-search while_loop with
    ``valid_best.params`` baked in. The sidecar carries the vocabulary
    (``idx_to_token``) and BOS/EOS ids, so ``load_exported_captioner``
    reconstructs token-list captions with zero model code.

    ``use_pallas_gru`` routes the encoder GRU through the Mosaic kernel at
    trace time — only meaningful for a TPU-only artifact (the portable
    default traces the pure-XLA scan, which every platform can run).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tennis_tpu.inference import load_captioner_state
    from tennis_tpu.ops.rnn import pallas_gru
    from tennis_tpu.translation import BeamSearchTranslator

    vocab, model, variables, info = load_captioner_state(
        model_id, root=root, gnmt_argv=gnmt_argv, src_max_len=src_max_len)
    translator = BeamSearchTranslator(
        model, bos_id=vocab[vocab.bos_token], eos_id=vocab[vocab.eos_token],
        beam_size=info["beam_size"], alpha=info["lp_alpha"], K=info["lp_k"],
        max_length=info["max_length"])
    run = translator.build_decoder(batch_size)

    def decode(feats, lengths):
        return run(variables, feats, lengths)

    feat_dim = info["feat_dim"]
    specs = (jax.ShapeDtypeStruct((batch_size, src_max_len, feat_dim),
                                  jnp.float32),
             jax.ShapeDtypeStruct((batch_size,), jnp.int32))
    with pallas_gru(use_pallas_gru):
        exp = jexport.export(
            jax.jit(decode),
            platforms=tuple(platforms) if platforms else None)(*specs)
    blob = exp.serialize()
    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": "captioner",
        "model_id": model_id,
        "batch_size": int(batch_size),
        "src_max_len": int(src_max_len),
        "feat_dim": int(feat_dim),
        "input": {"shape": [batch_size, src_max_len, feat_dim],
                  "dtype": "float32"},
        "idx_to_token": list(vocab.idx_to_token),
        "bos_id": int(vocab[vocab.bos_token]),
        "eos_id": int(vocab[vocab.eos_token]),
        "beam_size": int(info["beam_size"]),
        "lp_alpha": float(info["lp_alpha"]),
        "lp_k": int(info["lp_k"]),
        "max_length": int(info["max_length"]),
        "platforms": list(exp.platforms),
        "exp_dir": info["exp_dir"],
    }
    return blob, meta


def save_exported(out_path: str, blob: bytes, meta: dict) -> None:
    """Write ``out_path`` (the serialized program) + ``out_path + '.json'``
    (the sidecar), each via temp + atomic replace."""
    for path, data in ((out_path, blob),
                       (out_path + _META_SUFFIX,
                        json.dumps(meta, indent=1).encode())):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)


def _load_artifact(path: str, kind: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        rebuilt = jexport.deserialize(f.read())
    with open(path + _META_SUFFIX) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"{path}: unsupported export format {meta.get('format_version')} "
            f"(this loader reads version {_FORMAT_VERSION})")
    if meta.get("kind") != kind:
        raise ValueError(f"{path}: artifact kind {meta.get('kind')!r} — this "
                         f"loader reads {kind!r} exports")
    return rebuilt, meta


def load_exported(path: str):
    """Rebuild ``(classes, predict_probs, meta)`` from an exported artifact —
    the drop-in shape of ``tennis_tpu.inference.load_classifier``, with zero
    model-code dependency. ``predict_probs`` maps a uint8 (B, S, S, 3) batch
    (B fixed at export time) to host-side (B, num_classes) float32 softmax."""
    rebuilt, meta = _load_artifact(path, "vision-classifier")
    expect = tuple(meta["input"]["shape"])

    def predict_probs(images) -> np.ndarray:
        images = np.asarray(images)
        if images.shape != expect or images.dtype != np.uint8:
            raise ValueError(
                f"exported program is shape-static: expected uint8 {expect}, "
                f"got {images.dtype} {images.shape}")
        return np.asarray(rebuilt.call(images))

    return list(meta["classes"]), predict_probs, meta


def load_exported_captioner(path: str):
    """Rebuild ``(idx_to_token, caption_batch, meta)`` from a captioner
    export — the drop-in shape of ``tennis_tpu.inference.load_captioner``
    with the sidecar vocabulary in place of the Vocab object.
    ``caption_batch`` maps a float32 (B, src_max_len, D) feature batch +
    int32 (B,) valid lengths to a list of B token lists (top beam, BOS/EOS
    stripped — the reference's consumption pattern train_gnmt.py:291-295)."""
    rebuilt, meta = _load_artifact(path, "captioner")
    expect = tuple(meta["input"]["shape"])
    idx_to_token = list(meta["idx_to_token"])

    def caption_batch(feats, lengths):
        feats = np.asarray(feats, np.float32)
        lengths = np.asarray(lengths, np.int32)
        if feats.shape != expect or lengths.shape != (expect[0],):
            raise ValueError(
                f"exported program is shape-static: expected float32 "
                f"{expect} + int32 ({expect[0]},), got {feats.shape} / "
                f"{lengths.shape}")
        samples, _scores, valid = (np.asarray(a)
                                   for a in rebuilt.call(feats, lengths))
        out = []
        for b in range(samples.shape[0]):
            vl = int(valid[b, 0])
            # 1:vl-1 strips BOS and EOS — byte-identical to the live path's
            # BeamSearchTranslator.translate_tokens
            out.append([idx_to_token[int(i)] for i in samples[b, 0, 1:vl - 1]])
        return out

    return idx_to_token, caption_batch, meta


def main(_argv=None):
    import sys

    from absl import flags

    fv = flags.FlagValues()
    flags.DEFINE_enum("kind", "vision", ["vision", "captioner"],
                      "what to freeze: the classifier forward or the "
                      "captioner beam decode", flag_values=fv)
    flags.DEFINE_string("root", "data", "dataset root (classes.names)",
                        flag_values=fv)
    flags.DEFINE_string("model_id", "0006", "experiment id", flag_values=fv)
    flags.DEFINE_string("backbone", "DenseNet121", "backbone the experiment "
                        "was trained with (vision)", flag_values=fv)
    flags.DEFINE_integer("data_shape", 512, "input crop side (vision)",
                         flag_values=fv)
    flags.DEFINE_integer("batch_size", 8, "static serving batch size",
                         flag_values=fv)
    flags.DEFINE_integer("src_max_len", 128, "static source frame count "
                         "(captioner)", flag_values=fv)
    flags.DEFINE_multi_string(
        "gnmt_flag", [], "architecture flags forwarded to the train_gnmt "
        "surface when loading a captioner (e.g. --gnmt_flag=--num_hidden=256 "
        "--gnmt_flag=--feats_model=0006)", flag_values=fv)
    flags.DEFINE_bool("pallas_gru", False, "trace the captioner encoder "
                      "through the Mosaic GRU kernel (TPU-only artifact)",
                      flag_values=fv)
    flags.DEFINE_string("platforms", "", "comma-separated lowering platforms "
                        "(e.g. tpu,cpu); empty = current default backend",
                        flag_values=fv)
    flags.DEFINE_string("out", "", "artifact path (default: "
                        "<exp_dir>/export_*.hlo)", flag_values=fv)
    fv(["export"] + list(sys.argv[1:] if _argv is None else _argv))

    platforms = [p.strip() for p in fv.platforms.split(",") if p.strip()]
    if fv.kind == "captioner":
        blob, meta = export_captioner(
            fv.model_id, fv.batch_size, src_max_len=fv.src_max_len,
            root=fv.root, gnmt_argv=fv.gnmt_flag, platforms=platforms or None,
            use_pallas_gru=fv.pallas_gru)
        out = fv.out or os.path.join(
            meta["exp_dir"], f"export_cap_b{fv.batch_size}_t{fv.src_max_len}.hlo")
    else:
        blob, meta = export_classifier(fv.backbone, fv.model_id, fv.data_shape,
                                       fv.batch_size, root=fv.root,
                                       platforms=platforms or None)
        out = fv.out or os.path.join(
            meta["exp_dir"], f"export_b{fv.batch_size}_s{fv.data_shape}.hlo")
    save_exported(out, blob, meta)
    logging.info("exported %s (%d bytes, platforms=%s) + %s",
                 out, len(blob), ",".join(meta["platforms"]),
                 out + _META_SUFFIX)
    print(f"exported {out} ({len(blob)} bytes, "
          f"platforms={','.join(meta['platforms'])})")


if __name__ == "__main__":
    main()
