"""CPC pretrain / CTC finetune CLI.

Capability parity with reference: src/train_CPC.py:40-137 — `--type
pretrain` trains the contrastive CPC model on wave-only batches; `--type
finetune` trains GRU-CTC, optionally warm-starting and freezing the
CPC-pretrained WavConv front (training.load_splayer).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax

from openasr_tpu.bin.train import setup_logging
from openasr_tpu.config import load_config, validate_config, parse_range
from openasr_tpu.data.collate import WaveCollate, WaveOnlyCollate
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import SpeechDataset
from openasr_tpu.data.sampler import TimeBasedSampler
from openasr_tpu.data.tokenizer import SubwordTokenizer
from openasr_tpu.models import get_model_class
from openasr_tpu.parallel import make_mesh
from openasr_tpu.solvers import get_solver_class
from openasr_tpu.utils.checkpoint import load_package


def main(argv=None):
    from openasr_tpu.utils import (
        configure_compile_cache,
        pin_default_device,
    )
    pin_default_device()
    configure_compile_cache()
    setup_logging()
    parser = argparse.ArgumentParser(description="CPC pretrain / finetune")
    parser.add_argument("config")
    parser.add_argument("--type", choices=["pretrain", "finetune"],
                        default="pretrain")
    parser.add_argument("--continue-training", action="store_true")
    args = parser.parse_args(argv)

    config = load_config(args.config)
    validate_config(config, required=("data.trainset", "data.devset", "training.exp_dir", "training.batch_time", "training.lr_scheduler.type"))
    dataconfig = config["data"]
    trainingconfig = config["training"]
    modelconfig = config["model"]
    feat_range = parse_range(dataconfig.get("feat_range")) or (1, 10**9)

    mesh = make_mesh()
    ndata = mesh.shape["data"]
    workers = int(dataconfig.get("fetchworker_num", 2))
    budget = int(trainingconfig["batch_time"]) * ndata

    if args.type == "pretrain":
        train_set = SpeechDataset(dataconfig["trainset"], feat_range=feat_range)
        valid_set = SpeechDataset(dataconfig["devset"], reverse=True,
                                  feat_range=feat_range)
        collate = WaveOnlyCollate()
        model_type = "encoder_cpc"
        if "sp" in modelconfig and "signal" not in modelconfig:
            modelconfig["signal"] = modelconfig["sp"]
    else:
        tokenizer = SubwordTokenizer(
            dataconfig["vocab_path"], add_blk=modelconfig.get("add_blk", True)
        )
        modelconfig["decoder"]["vocab_size"] = tokenizer.unit_num()
        label_range = parse_range(dataconfig.get("label_range")) or (1, 100)
        train_set = SpeechDataset(dataconfig["trainset"],
                                  feat_range=feat_range,
                                  label_range=label_range)
        valid_set = SpeechDataset(dataconfig["devset"], reverse=True,
                                  feat_range=feat_range,
                                  label_range=label_range)
        collate = WaveCollate(
            tokenizer, modelconfig.get("add_eos", False),
            trainingconfig.get("label_type", "tokens"),
        )
        model_type = "gru_ctc"

    tr_loader = DataLoader(
        train_set, TimeBasedSampler(train_set, budget, ndata, shuffle=True),
        collate, num_workers=workers,
    )
    cv_loader = DataLoader(
        valid_set, TimeBasedSampler(valid_set, budget, ndata),
        collate, num_workers=workers,
    )

    modelconfig["type"] = model_type
    model = get_model_class(model_type).create_model(modelconfig)

    if args.type == "finetune" and trainingconfig.get("load_splayer"):
        logging.info("Load pretrained splayer from %s",
                     trainingconfig["load_splayer"])
        pkg = load_package(trainingconfig["load_splayer"])
        model.load_splayer(pkg["model"] if "model" in pkg else pkg)

    pkg = None
    if args.continue_training:
        path = os.path.join(trainingconfig["exp_dir"], "last.pkg")
        pkg = load_package(path)
        model.restore(pkg["model"])

    solver = get_solver_class(model_type)(
        model, trainingconfig, tr_loader, cv_loader, mesh=mesh
    )
    if pkg is not None:
        solver.restore(pkg)
    solver.train()


if __name__ == "__main__":
    main()
