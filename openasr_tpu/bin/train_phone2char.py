"""phone->char training CLI (seq2seq or CTC).

Capability parity with reference: src/train_phone2char.py:40-116 —
dispatches Embed_Decoder (+CE solver) or Embed_Decoder_CTC (+CTC solver)
by model.type, dual tokenizers (phone input, char target).
"""

from __future__ import annotations

import argparse
import logging
import os

from openasr_tpu.bin.train import setup_logging
from openasr_tpu.config import load_config, validate_config, parse_range
from openasr_tpu.data.collate import PhoneCharCollate
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import PhoneCharDataset
from openasr_tpu.data.sampler import BudgetBatchSampler
from openasr_tpu.data.tokenizer import CharTokenizer
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
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--continue-training", action="store_true")
    args = parser.parse_args(argv)

    config = load_config(args.config)
    validate_config(config, required=("data.trainset", "data.devset", "data.vocab_phone", "data.vocab_char", "training.exp_dir", "training.lr_scheduler.type"))
    dataconfig = config["data"]
    trainingconfig = config["training"]
    modelconfig = config["model"]

    feat_range = parse_range(dataconfig.get("feat_range")) or (1, 99999)
    label_range = parse_range(dataconfig.get("label_range")) or (1, 100)

    tokenizer_phone = CharTokenizer(dataconfig["vocab_phone"])
    tokenizer_char = CharTokenizer(
        dataconfig["vocab_char"], add_blk=modelconfig.get("add_blk", False)
    )
    modelconfig["encoder"]["vocab_size"] = tokenizer_phone.unit_num()
    modelconfig["decoder"]["vocab_size"] = tokenizer_char.unit_num()

    mesh = make_mesh()
    ndata = mesh.shape["data"]
    budget = int(trainingconfig["batch_phones"]) * ndata
    workers = int(dataconfig.get("fetchworker_num", 2))

    train_set = PhoneCharDataset(
        dataconfig["trainset"], feat_range=feat_range,
        label_range=label_range, multi=int(dataconfig.get("multi", 1)),
    )
    valid_set = PhoneCharDataset(dataconfig["devset"], reverse=True)
    collate = PhoneCharCollate(
        tokenizer_phone, tokenizer_char, modelconfig.get("add_eos", True)
    )
    tr_loader = DataLoader(
        train_set,
        BudgetBatchSampler(train_set, budget, key="phone_length",
                           divisible_by=ndata, shuffle=True),
        collate, num_workers=workers,
    )
    cv_loader = DataLoader(
        valid_set,
        BudgetBatchSampler(valid_set, budget, key="phone_length",
                           divisible_by=ndata),
        collate, num_workers=workers,
    )

    model_type = modelconfig["type"]
    model = get_model_class(model_type).create_model(modelconfig)

    pkg = None
    if args.continue_training:
        pkg = load_package(os.path.join(trainingconfig["exp_dir"], "last.pkg"))
        model.restore(pkg["model"])

    solver = get_solver_class(model_type)(
        model, trainingconfig, tr_loader, cv_loader, mesh=mesh
    )
    if pkg is not None:
        solver.restore(pkg)
    solver.train()


if __name__ == "__main__":
    main()
