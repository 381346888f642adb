"""Language-model training CLI (LSTM or Transformer LM).

Restores the capability of the reference's bit-rotted src/train_lm.py
(its imports referenced a deleted flat layout, train_lm.py:38-41); the
config schema keeps data/model/training sections with model.type
'lstm_lm' | 'transformer_lm'.
"""

from __future__ import annotations

import argparse
import os

from openasr_tpu.bin.train import setup_logging
from openasr_tpu.config import load_config, validate_config
from openasr_tpu.data.collate import TextCollate
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import TextLineByLineDataset
from openasr_tpu.data.sampler import CountBatchSampler
from openasr_tpu.data.tokenizer import CharTokenizer
from openasr_tpu.models import get_model_class
from openasr_tpu.parallel import make_mesh
from openasr_tpu.solvers import CESolver
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
    validate_config(config, required=("data.trainset", "data.devset", "data.vocab_path", "training.exp_dir", "training.lr_scheduler.type"))
    dataconfig = config["data"]
    trainingconfig = config["training"]
    modelconfig = config["model"]

    tokenizer = CharTokenizer(dataconfig["vocab_path"])
    modelconfig["vocab_size"] = tokenizer.unit_num()

    mesh = make_mesh()
    ndata = mesh.shape["data"]
    bs = int(trainingconfig.get("batch_size", 32)) * ndata
    workers = int(dataconfig.get("fetchworker_num", 2))
    maxlen = dataconfig.get("maxlen")

    train_set = TextLineByLineDataset(dataconfig["trainset"])
    valid_set = TextLineByLineDataset(dataconfig["devset"])
    collate = TextCollate(tokenizer, maxlen=maxlen)
    tr_loader = DataLoader(
        train_set,
        CountBatchSampler(len(train_set), bs, shuffle=True, drop_last=True),
        collate, num_workers=workers,
    )
    cv_loader = DataLoader(
        valid_set, CountBatchSampler(len(valid_set), bs), collate,
        num_workers=workers,
    )

    model_type = modelconfig.get("type", "lstm_lm")
    model = get_model_class(model_type).create_model(modelconfig)

    pkg = None
    if args.continue_training:
        pkg = load_package(os.path.join(trainingconfig["exp_dir"], "last.pkg"))
        model.restore(pkg["model"])

    solver = CESolver(model, trainingconfig, tr_loader, cv_loader, mesh=mesh)
    if pkg is not None:
        solver.restore(pkg)
    solver.train()


if __name__ == "__main__":
    main()
