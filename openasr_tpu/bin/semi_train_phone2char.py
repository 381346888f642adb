"""Semi-supervised WGAN-GP phone->char training CLI.

Capability parity with reference: src/semi_train_phone2char.py:40-103 —
three loaders (paired json, unpaired phone lines, unpaired text lines),
generator warm-start via training.G_path.
"""

from __future__ import annotations

import argparse
import os

from openasr_tpu.bin.train import setup_logging
from openasr_tpu.config import load_config, validate_config, parse_range
from openasr_tpu.data.collate import PhoneCharCollate, TokenCollate
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import SemiPhoneCharDataset, TokenDataset
from openasr_tpu.data.sampler import BudgetBatchSampler, CountBatchSampler
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
    validate_config(config, required=("data.trainset", "data.vocab_phone", "data.vocab_char", "training.exp_dir", "training.lr_scheduler.type"))
    dataconfig = config["data"]
    trainingconfig = config["training"]
    modelconfig = config["model"]

    tokenizer_phone = CharTokenizer(dataconfig["vocab_phone"])
    tokenizer_char = CharTokenizer(
        dataconfig["vocab_char"], add_blk=modelconfig.get("add_blk", True)
    )
    modelconfig["G"]["encoder"]["vocab_size"] = tokenizer_phone.unit_num()
    modelconfig["G"]["decoder"]["vocab_size"] = tokenizer_char.unit_num()
    modelconfig["D"]["encoder"]["d_input"] = tokenizer_char.unit_num()
    modelconfig["type"] = "gan_phone2char"

    feat_range = parse_range(dataconfig.get("feat_range")) or (1, 99999)
    label_range = parse_range(dataconfig.get("label_range")) or (1, 100)

    dataset = SemiPhoneCharDataset(
        dataconfig["unpaired_phone"], dataconfig["unpaired_text"],
        dataconfig["trainset"], feat_range=feat_range,
        label_range=label_range,
    )
    valid_set = SemiPhoneCharDataset(
        dataconfig["unpaired_phone"], dataconfig["unpaired_text"],
        dataconfig["devset"],
    )

    mesh = make_mesh()
    ndata = mesh.shape["data"]
    workers = int(dataconfig.get("fetchworker_num", 2))
    budget = int(trainingconfig["batch_phones"]) * ndata
    unpaired_bs = int(trainingconfig.get("unpaired_batch_size", 16)) * ndata

    paired_collate = PhoneCharCollate(
        tokenizer_phone, tokenizer_char, modelconfig.get("add_eos", False)
    )
    tr_loader = DataLoader(
        dataset,
        BudgetBatchSampler(dataset, budget, key="phone_length",
                           divisible_by=ndata, shuffle=True),
        paired_collate, num_workers=workers,
    )
    cv_loader = DataLoader(
        valid_set,
        BudgetBatchSampler(valid_set, budget, key="phone_length",
                           divisible_by=ndata),
        paired_collate, num_workers=workers,
    )
    phone_set = TokenDataset(dataconfig["unpaired_phone"])
    text_set = TokenDataset(dataconfig["unpaired_text"])
    phone_loader = DataLoader(
        phone_set, CountBatchSampler(len(phone_set), unpaired_bs,
                                     shuffle=True, drop_last=True),
        TokenCollate(tokenizer_phone), num_workers=workers,
    )
    text_loader = DataLoader(
        text_set, CountBatchSampler(len(text_set), unpaired_bs,
                                    shuffle=True, drop_last=True),
        TokenCollate(tokenizer_char), num_workers=workers,
    )

    model = get_model_class("gan_phone2char").create_model(modelconfig)
    if trainingconfig.get("G_path"):
        pkg = load_package(trainingconfig["G_path"])
        model.restore_G(pkg["model"] if "model" in pkg else pkg)

    pkg = None
    if args.continue_training:
        pkg = load_package(os.path.join(trainingconfig["exp_dir"], "last.pkg"))
        model.restore(pkg["model"])

    solver = get_solver_class("gan_phone2char")(
        model, trainingconfig, tr_loader, cv_loader,
        phone_loader=phone_loader, text_loader=text_loader, mesh=mesh,
    )
    if pkg is not None:
        solver.restore(pkg)
    solver.train()


if __name__ == "__main__":
    main()
