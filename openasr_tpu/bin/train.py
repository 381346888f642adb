"""Supervised ASR training CLI.

Capability parity with reference: src/train.py:40-146 — same YAML schema
(data / model / training sections), same model-type dispatch, same
--continue-training and pretrained_model warm-start (with init_lr * 0.1)
semantics.  The ngpu multiplier on the batch budget becomes the mesh's
data-axis size.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp

from openasr_tpu.config import load_config, parse_range, validate_config
from openasr_tpu.data.collate import FeatureCollate, WaveCollate
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import ArkDataset, SpeechDataset
from openasr_tpu.data.sampler import FrameBasedSampler, TimeBasedSampler
from openasr_tpu.data.tokenizer import CharTokenizer
from openasr_tpu.models import get_model_class
from openasr_tpu.parallel import make_mesh
from openasr_tpu.parallel.mesh import mesh_process_count, mesh_process_index
from openasr_tpu.solvers import get_solver_class
from openasr_tpu.utils.checkpoint import load_package


def setup_logging():
    level = os.environ.get("LAS_LOG_LEVEL", "INFO")
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(message)s",
    )


def _norm_type(modelconfig) -> str:
    return str(modelconfig["type"]).lower().replace("-", "_")


def build_loaders(dataconfig, trainingconfig, modelconfig, tokenizer, ndata,
                  tokenizer_phone=None, rank=0, world=1):
    feat_range = parse_range(dataconfig.get("feat_range")) or (1, 99999)
    label_range = parse_range(dataconfig.get("label_range")) or (1, 100)
    label_type = trainingconfig.get("label_type", "tokens")
    workers = int(dataconfig.get("fetchworker_num", 2))

    mtype = _norm_type(modelconfig)
    if mtype in ("cif_fc", "cif_mix"):
        # phone-level CIF paths (the reference shipped CIF_FC / CIF_MIX
        # solvers + configs but never dispatched them from train.py;
        # here they are first-class)
        from openasr_tpu.data.collate import (
            FeatPhoneCharCollate,
            FeatPhoneCollate,
        )

        tok_phone = tokenizer_phone or tokenizer
        train_set = ArkDataset(
            dataconfig["trainset"], feat_range=feat_range,
            label_range=label_range,
        )
        valid_set = ArkDataset(dataconfig["devset"], reverse=True)
        if mtype == "cif_mix":
            collate = FeatPhoneCharCollate(
                tok_phone, tokenizer, modelconfig.get("add_eos", False)
            )
        else:
            collate = FeatPhoneCollate(tok_phone)
        tr_sampler = FrameBasedSampler(
            train_set, int(trainingconfig["batch_frames"]) * ndata, ndata,
            shuffle=True,
        )
        cv_sampler = FrameBasedSampler(
            valid_set, int(trainingconfig["batch_frames"]) * ndata, ndata,
            shuffle=False,
        )
        tr = DataLoader(train_set, tr_sampler, collate, num_workers=workers,
                        rank=rank, world=world)
        cv = DataLoader(valid_set, cv_sampler, collate, num_workers=workers,
                        rank=rank, world=world)
        return tr, cv

    if modelconfig["signal"]["feature_type"] == "offline":
        train_set = ArkDataset(
            dataconfig["trainset"], feat_range=feat_range, label_range=label_range
        )
        valid_set = ArkDataset(dataconfig["devset"], reverse=True)
        collate = FeatureCollate(
            tokenizer, modelconfig.get("add_eos", False), label_type
        )
        tr_sampler = FrameBasedSampler(
            train_set, int(trainingconfig["batch_frames"]) * ndata, ndata,
            shuffle=True,
        )
        cv_sampler = FrameBasedSampler(
            valid_set, int(trainingconfig["batch_frames"]) * ndata, ndata,
            shuffle=False,
        )
    else:
        train_set = SpeechDataset(
            dataconfig["trainset"], feat_range=feat_range, label_range=label_range
        )
        valid_set = SpeechDataset(dataconfig["devset"], reverse=True)
        collate = WaveCollate(
            tokenizer, modelconfig.get("add_eos", False), label_type,
            # fbank geometry is derived from signal.sample_rate: reject
            # files at a different rate instead of silently computing
            # features at the wrong time/frequency scale.  Raw-wave
            # (feature_type 'wave') models are not rate-validated.
            expected_rate=modelconfig["signal"].get("sample_rate", 16000)
            if modelconfig["signal"].get("feature_type") == "fbank"
            else None,
        )
        tr_sampler = TimeBasedSampler(
            train_set, int(trainingconfig["batch_time"]) * ndata, ndata,
            shuffle=True,
        )
        cv_sampler = TimeBasedSampler(
            valid_set, int(trainingconfig["batch_time"]) * ndata, ndata,
            shuffle=False,
        )
    tr_loader = DataLoader(train_set, tr_sampler, collate, num_workers=workers,
                           rank=rank, world=world)
    cv_loader = DataLoader(valid_set, cv_sampler, collate, num_workers=workers,
                           rank=rank, world=world)
    return tr_loader, cv_loader


def main(argv=None):
    from openasr_tpu.utils import (
        configure_compile_cache,
        pin_default_device,
    )
    pin_default_device()
    configure_compile_cache()
    setup_logging()
    parser = argparse.ArgumentParser(description="Train an ASR model (TPU)")
    parser.add_argument("config", help="path to YAML config")
    parser.add_argument("--continue-training", action="store_true",
                        default=False)
    parser.add_argument("--model-parallel", type=int, default=1,
                        help="tensor-parallel degree (mesh model axis)")
    parser.add_argument("--pipeline", type=int, default=1,
                        help="pipeline-parallel stage count (mesh pipe "
                             "axis); requires encoder.pipeline: true "
                             "(stacked layer layout) in the model config")
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="multi-host: call jax.distributed.initialize() "
                             "(same train-step code; the mesh spans all "
                             "hosts' chips over ICI/DCN)")
    args = parser.parse_args(argv)

    if args.distributed or os.environ.get("OPENASR_MULTIHOST") == "1":
        jax.distributed.initialize()

    config = load_config(args.config)
    validate_config(config, required=(
        "data.trainset", "data.devset", "data.vocab_path",
        "model.type", "training.exp_dir", "training.num_epoch",
        "training.init_lr", "training.optimtype",
        "training.lr_scheduler.type",
    ))
    dataconfig = config["data"]
    trainingconfig = config["training"]
    modelconfig = config["model"]
    # the batch budget key depends on the pipeline: offline features pack
    # by frames, online waves by samples (a bare KeyError otherwise)
    mtype0 = _norm_type(modelconfig)
    if mtype0 in ("cif_fc", "cif_mix"):
        offline = True  # text/feature multitask: no signal frontend
    else:
        sig = modelconfig.get("signal") or {}
        if "feature_type" not in sig:
            raise ValueError(
                "config: model.signal.feature_type is required "
                "('offline' for precomputed features, or a wave frontend "
                "like 'fbank' / 'wav_conv' for the online pipeline)"
            )
        offline = sig["feature_type"] == "offline"
    budget_key = "batch_frames" if offline else "batch_time"
    if budget_key not in trainingconfig:
        raise ValueError(
            f"config: training.{budget_key} is required for the "
            f"{'offline-feature' if offline else 'online-wave'} pipeline "
            f"({'cumulative frames' if offline else 'cumulative samples'} "
            "per batch)"
        )

    if args.pipeline > 1 and not config.model.get("encoder", {}).get(
        "pipeline", False
    ):
        raise SystemExit(
            "--pipeline requires the stacked layer layout: set "
            "encoder.pipeline: true in the model config (and convert "
            "existing checkpoints with tools/stack_encoder_pkg.py)"
        )
    mesh = make_mesh(model=args.model_parallel, pipe=args.pipeline)
    ndata = mesh.shape["data"]
    logging.info("Mesh: %s", dict(mesh.shape))

    tokenizer = CharTokenizer(
        dataconfig["vocab_path"], add_blk=modelconfig.get("add_blk", False)
    )
    modelconfig["decoder"]["vocab_size"] = tokenizer.unit_num()

    tokenizer_phone = None
    if dataconfig.get("vocab_phone"):
        tokenizer_phone = CharTokenizer(dataconfig["vocab_phone"],
                                        add_blk=True)
        if "phone_size" in modelconfig or _norm_type(modelconfig) == "cif_mix":
            modelconfig["phone_size"] = tokenizer_phone.unit_num()

    # multi-host: every host builds the identical batch plan and loads
    # its own row-slice (data/loader.py); ndata is the GLOBAL data-axis
    # size, so per-host batches stay divisible by the local share
    tr_loader, cv_loader = build_loaders(
        dataconfig, trainingconfig, modelconfig, tokenizer, ndata,
        tokenizer_phone=tokenizer_phone,
        rank=mesh_process_index(mesh), world=mesh_process_count(mesh),
    )

    # CIF_MIX zips a second, acoustic-only (feats+phones) loader with the
    # paired loader (reference: src/solvers/cif.py:433-492 semantics; its
    # train.py never dispatched this type)
    acoustic_loader = None
    if _norm_type(modelconfig) == "cif_mix" and dataconfig.get("acousticset"):
        from openasr_tpu.data.collate import FeatPhoneCollate

        ac_set = ArkDataset(
            dataconfig["acousticset"],
            feat_range=parse_range(dataconfig.get("feat_range")) or (1, 99999),
            label_range=(0, 10**9), rate_in_out=(0, 10**9),
        )
        ac_sampler = FrameBasedSampler(
            ac_set, int(trainingconfig["batch_frames"]) * ndata, ndata,
            shuffle=True,
        )
        acoustic_loader = DataLoader(
            ac_set, ac_sampler, FeatPhoneCollate(tokenizer_phone or tokenizer),
            num_workers=int(dataconfig.get("fetchworker_num", 2)),
            rank=mesh_process_index(mesh), world=mesh_process_count(mesh),
        )

    # bf16 compute (fp32 params/optimizer) is the TPU-native mixed-precision
    # mode: training.compute_dtype: bfloat16
    dtype_name = str(trainingconfig.get("compute_dtype", "float32"))
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]

    model_cls = get_model_class(modelconfig["type"])
    model = model_cls.create_model(
        modelconfig, rng=jax.random.PRNGKey(0), dtype=dtype
    )
    logging.info("Model %s: %.2fM params", modelconfig["type"],
                 model.num_params() / 1e6)

    pkg = None
    if args.continue_training:
        path = os.path.join(trainingconfig["exp_dir"], "last.pkg")
        logging.info("Restoring from %s", path)
        pkg = load_package(path)
        model.restore(pkg["model"])
    elif trainingconfig.get("pretrained_model"):
        logging.info("Warm start from %s", trainingconfig["pretrained_model"])
        pre = load_package(trainingconfig["pretrained_model"])
        model.restore(pre["model"], without_fc=True)
        trainingconfig["init_lr"] = float(trainingconfig["init_lr"]) * 0.1

    solver_cls = get_solver_class(modelconfig["type"])
    solver_kwargs = {}
    if acoustic_loader is not None:
        solver_kwargs["acoustic_loader"] = acoustic_loader
    solver = solver_cls(model, trainingconfig, tr_loader, cv_loader,
                        mesh=mesh, **solver_kwargs)
    if pkg is not None:
        solver.restore(pkg)
    logging.info("Start training...")
    solver.train()


if __name__ == "__main__":
    main()
