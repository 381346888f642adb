"""phone2char solvers: seq2seq CE, CTC (with dev WER), and the WGAN-GP
semi-supervised alternation.

Capability parity with reference: src/solvers/phone2char.py:15-318.
"""

from __future__ import annotations

import itertools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.parallel import shard_batch
from openasr_tpu.solvers import SOLVER_REGISTRY, CESolver, Solver, array_fields
from openasr_tpu.utils.metrics import batch_distance

logger = logging.getLogger(__name__)


class Phone2CharSolver(CESolver):
    """CE over Phone_Char batches (reference: phone2char.py:15-122)."""


class Phone2CharCTCSolver(Solver):
    """CTC over Phone_Char batches; dev pass reports WER via greedy decode
    (reference: phone2char.py:125-238)."""

    main_loss_key = "ctc_loss"
    main_loss_norm = "n_tokens"

    def mix_losses(self, losses):
        return losses["ctc_loss"] / losses["n_tokens"]

    def iter_one_epoch(self, cross_valid: bool = False) -> float:
        loss = super().iter_one_epoch(cross_valid)
        if cross_valid and self.cv_loader:
            # the reference computes dev WER every dev epoch
            # (reference: src/solvers/phone2char.py:232-238)
            wer = self.dev_wer()
            self._log_metrics({
                "phase": "cv", "epoch": self.epoch, "step": self.step,
                "dev_wer": wer,
            })
        return loss

    def dev_wer(self) -> float:
        # jit once: XLA's shape-keyed jit cache then compiles one program
        # per quantized cv bucket instead of re-tracing every epoch
        if not hasattr(self, "_jit_greedy"):
            self._jit_greedy = jax.jit(self.model.greedy_decode)
        dist, n_ref = 0, 0
        for batch in self.cv_loader:
            ids, lens = self._jit_greedy(
                self.model.params, batch["phones"], batch["phone_lengths"]
            )
            ids, lens = np.asarray(ids), np.asarray(lens)
            labels = np.asarray(batch["labels"])
            tlen = (1 - np.asarray(batch["paddings"])).sum(-1).astype(int)
            hyps = [list(ids[i, : lens[i]]) for i in range(len(lens))]
            refs = [list(labels[i, : tlen[i]]) for i in range(len(tlen))]
            dist += batch_distance(refs, hyps)
            n_ref += sum(len(r) for r in refs)
        wer = dist / max(n_ref, 1)
        logger.info("dev WER: %.2f%%", 100.0 * wer)
        return wer


class Phone2CharCTCGANSolver(Phone2CharCTCSolver):
    """Semi-supervised alternation: per iteration one paired batch
    (supervised CTC) + one unpaired-phone batch (G step) + one
    unpaired-text batch (D step); all three losses feed ONE combined
    gradient/update, matching the reference's accumulated backward passes
    (reference: phone2char.py:251-318)."""

    def __init__(self, model, config, tr_loader, cv_loader,
                 phone_loader=None, text_loader=None, **kw):
        self.phone_loader = phone_loader
        self.text_loader = text_loader
        super().__init__(model, config, tr_loader, cv_loader, **kw)

    def mix_losses(self, losses):
        loss = losses["ctc_loss"] / losses["n_tokens"]
        if "g_loss" in losses:
            loss = loss + losses["g_loss"]
        if "d_loss" in losses:
            loss = loss + losses["d_loss"]
        return loss

    def iter_one_epoch(self, cross_valid: bool = False) -> float:
        if cross_valid or self.phone_loader is None:
            return super().iter_one_epoch(cross_valid)

        tot_main, tot_norm = 0.0, 0.0
        params = self.model.params
        paired_cycle = itertools.cycle(iter(self.tr_loader))
        text_cycle = itertools.cycle(iter(self.text_loader))
        # reference: grads accumulate over `accumulate_grad_batch`
        # iterations (each = supervised CTC + G pass + D pass) and the
        # optimizer steps on the boundary or at epoch end
        # (src/solvers/phone2char.py:272-316)
        accum = max(1, int(self.config.get("accumulate_grad_batch", 1)))
        cur = self._accum_begin() if accum > 1 else None
        tot_iters = len(self.phone_loader)
        for niter, phone_batch in enumerate(iter(self.phone_loader), 1):
            if self._should_stop(niter):
                logger.warning(
                    "preemption: stopping epoch %d at batch %d/%d",
                    self.epoch, niter, tot_iters,
                )
                break
            paired = next(paired_cycle)
            text = next(text_cycle)
            combined = dict(array_fields(paired))
            combined["unpaired_phones"] = phone_batch["tokens"]
            combined["unpaired_phone_lengths"] = phone_batch["token_lengths"]
            combined["unpaired_text"] = text["tokens"]
            combined["unpaired_text_lengths"] = text["token_lengths"]
            arrays = shard_batch(combined, self.mesh)
            rng = jax.random.fold_in(self.rng, self.step * 8191 + niter)
            if cur is not None:
                loss, losses = self._accum_micro(cur, params, arrays, rng)
                params = self._accum_maybe_apply(
                    cur, params, niter % accum == 0 or niter == tot_iters
                )
            else:
                params, self.opt_state, loss, losses = self._train_step(
                    params, self.opt_state, arrays, rng
                )
                self.model.params = params
                self.step += 1
            tot_main += float(losses["ctc_loss"])
            tot_norm += float(losses["n_tokens"])
            if niter % self.print_inteval == 0:
                logger.info(
                    "Epoch %d | Step %d | ctc %.3f g %.3f d %.3f | lr %.3e",
                    self.epoch, self.step,
                    float(losses["ctc_loss"]) / max(float(losses["n_tokens"]), 1),
                    float(losses.get("g_loss", 0.0)),
                    float(losses.get("d_loss", 0.0)),
                    self.current_lr(),
                )
        return tot_main / max(tot_norm, 1e-9)


class CPCSolver(Solver):
    """Contrastive pretraining (reference: src/solvers/cpc.py:9-100)."""

    main_loss_key = "cpc_loss"
    main_loss_norm = "n_seqs"

    def mix_losses(self, losses):
        return losses["cpc_loss"] / losses["n_seqs"]


SOLVER_REGISTRY.update({
    "Embed_Decoder": Phone2CharSolver,
    "Embed_Decoder_CTC": Phone2CharCTCSolver,
    "gan_phone2char": Phone2CharCTCGANSolver,
    "encoder_cpc": CPCSolver,
})
