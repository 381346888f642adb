"""Benchmark: training throughput (utts/sec/chip) of the flagship
conv-ctc-transformer, vs an equivalent PyTorch-CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The JAX side runs the real jitted train step (fwd + CTC/CE losses + grads +
clip + Adam) in bf16 compute / fp32 params on the available accelerator.
The baseline is the same architecture/batch in PyTorch on CPU (the
reference implementation's only runnable mode today), measured inline.
Set BENCH_FAST=1 for a quick smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

FAST = os.environ.get("BENCH_FAST", "0") == "1"

# Benchmark shape: AISHELL-1-like batch (frame-budget ~ B*T).  B=64 is the
# TPU-appropriate bucket (throughput saturates ~B=128 on one chip; B=16
# leaves the MXU ~3.5x underutilized).
VOCAB = 4233
B = 8 if FAST else 64
T = 256 if FAST else 512
D = 80
U = 24
D_MODEL = 256 if FAST else 512
LAYERS = 2 if FAST else 6
FFN = 4 * D_MODEL
NHEAD = 8


def make_batch():
    rng = np.random.RandomState(0)
    paddings = np.zeros((B, U), np.float32)
    paddings[:, U - 4 :] = 1.0
    return {
        "feats": rng.randn(B, T, D).astype(np.float32),
        "feat_lengths": np.linspace(T * 3 // 4, T, B).astype(np.int32),
        "ids": rng.randint(3, VOCAB - 1, (B, U)).astype(np.int32),
        "labels": rng.randint(3, VOCAB - 1, (B, U)).astype(np.int32),
        "paddings": paddings,
    }


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class
    from openasr_tpu.parallel import make_mesh, shard_batch
    from openasr_tpu.solvers import array_fields, get_solver_class

    cfg = Config({
        "type": "conv-ctc-transformer",
        "add_eos": True,
        "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 2},
                    "input_dim": D, "d_model": D_MODEL, "nhead": NHEAD,
                    "dim_feedforward": FFN, "activation": "glu",
                    "num_layers": LAYERS, "dropout_rate": 0.1},
        "decoder": {"type": "TransformerDecoder", "vocab_size": VOCAB,
                    "d_model": D_MODEL, "nhead": NHEAD, "num_layers": LAYERS,
                    "encoder_dim": D_MODEL, "dim_feedforward": FFN,
                    "activation": "glu", "dropout_rate": 0.1},
    })
    model = get_model_class(cfg.type).create_model(cfg, dtype=jnp.bfloat16)
    devices = jax.devices()[:1]
    mesh = make_mesh(devices, model=1)
    training = Config({
        "num_epoch": 1, "exp_dir": "/tmp/openasr_bench",
        "print_inteval": 10**9, "accumulate_grad_batch": 1,
        "init_lr": 1.0, "optimtype": "adam", "grad_max_norm": 50.0,
        "label_smooth": 0.1, "lambda_ctc": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 10000,
                         "d_model": D_MODEL},
    })
    solver = get_solver_class(cfg.type)(model, training, [], [], mesh=mesh)
    batch = shard_batch(array_fields(make_batch()), mesh)
    rng = jax.random.PRNGKey(0)

    params, opt_state = model.params, solver.opt_state
    # warmup / compile
    for i in range(2):
        params, opt_state, loss, _ = solver._train_step(
            params, opt_state, batch, jax.random.fold_in(rng, i)
        )
    jax.block_until_ready(loss)

    n_steps = 3 if FAST else 20
    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, loss, _ = solver._train_step(
            params, opt_state, batch, jax.random.fold_in(rng, 100 + i)
        )
    jax.block_until_ready(loss)
    dt = time.time() - t0
    return B * n_steps / dt


def bench_torch_cpu() -> float:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)

    class Sub(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(1, 32, 3, (2, 1))
            self.c2 = nn.Conv2d(32, 32, 3, (2, 1))
            self.affine = nn.Linear(32 * (D - 4), D_MODEL)

        def forward(self, x, lengths):
            x = F.relu(self.c2(F.relu(self.c1(x.unsqueeze(1)))))
            b, c, t, d = x.shape
            x = x.permute(0, 2, 1, 3).reshape(b, t, c * d)
            return self.affine(x), ((lengths - 1) // 2 - 1) // 2

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.sub = Sub()
            enc_layer = nn.TransformerEncoderLayer(
                D_MODEL, NHEAD, FFN, 0.1, batch_first=True
            )
            self.encoder = nn.TransformerEncoder(enc_layer, LAYERS)
            dec_layer = nn.TransformerDecoderLayer(
                D_MODEL, NHEAD, FFN, 0.1, batch_first=True
            )
            self.decoder = nn.TransformerDecoder(dec_layer, LAYERS)
            self.emb = nn.Embedding(VOCAB, D_MODEL)
            self.out = nn.Linear(D_MODEL, VOCAB)
            self.ctc_fc = nn.Linear(D_MODEL, VOCAB, bias=False)

        def forward(self, feats, lengths, ids, labels, paddings):
            enc, elens = self.sub(feats, lengths)
            enc = self.encoder(enc)
            ctc_logits = self.ctc_fc(enc)
            tgt = self.emb(ids) * (D_MODEL ** 0.5)
            tmask = nn.Transformer.generate_square_subsequent_mask(ids.shape[1])
            dec = self.decoder(tgt, enc, tgt_mask=tmask)
            ce_logits = self.out(dec)
            tlen = (1 - paddings).sum(-1).long()
            ctc = F.ctc_loss(
                F.log_softmax(ctc_logits, -1).transpose(0, 1), labels,
                elens.long(), (tlen - 1).clamp(min=1), reduction="none",
                blank=VOCAB - 1, zero_infinity=True,
            ).sum()
            ce = (
                F.cross_entropy(
                    ce_logits.reshape(-1, VOCAB), labels.reshape(-1).long(),
                    reduction="none",
                ).reshape(paddings.shape)
                * (1 - paddings)
            ).sum()
            ntok = (1 - paddings).sum()
            return ce / ntok + ctc / feats.shape[0]

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    b = make_batch()
    feats = torch.tensor(b["feats"])
    lengths = torch.tensor(b["feat_lengths"])
    ids = torch.tensor(b["ids"]).long()
    labels = torch.tensor(b["labels"]).long()
    paddings = torch.tensor(b["paddings"])

    def step():
        opt.zero_grad()
        loss = model(feats, lengths, ids, labels, paddings)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 50.0)
        opt.step()

    step()  # warmup
    n_steps = 1 if FAST else 3
    t0 = time.time()
    for _ in range(n_steps):
        step()
    dt = time.time() - t0
    return B * n_steps / dt


def bench_decode_rtf() -> float:
    """Steady-state jitted beam-search RTF (batch of 10 s utterances)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from openasr_tpu.models import get_model_class

    cfg = _flagship_config(vocab_size=VOCAB, d_model=256, layers=4)
    model = get_model_class(cfg.type).create_model(cfg)
    b, t = 8, 1000  # 10 s per utterance at 10 ms frames
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, t, D), jnp.float32)
    lens = jnp.asarray([t] * b, jnp.int32)

    def decode(feats, lens):
        return model.batch_beam_decode(
            model.params, feats, lens, beam_size=5, max_decode_len=60
        )

    jd = jax.jit(decode)
    jax.block_until_ready(jd(feats, lens))  # compile
    n = 2 if FAST else 5
    t0 = time.time()
    for _ in range(n):
        out = jd(feats, lens)
    jax.block_until_ready(out)
    return ((time.time() - t0) / n) / (b * t * 0.01)


def main():
    jax_tput = bench_jax()
    torch_tput = bench_torch_cpu()
    detail = {
        "batch": B, "frames": T, "d_model": D_MODEL, "layers": LAYERS,
        "torch_cpu_utts_per_sec": round(torch_tput, 3),
    }
    if os.environ.get("BENCH_DECODE", "1") == "1":
        detail["beam_decode_rtf"] = round(bench_decode_rtf(), 5)
    result = {
        "metric": "train_throughput_conv_ctc_transformer",
        "value": round(jax_tput, 3),
        "unit": "utts/sec/chip",
        "vs_baseline": round(jax_tput / torch_tput, 3),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
