"""CIF solvers: loss mixing with lambda_qua / lambda_ctc, and the CIF_MIX
dual-loader epoch.

Capability parity with reference: src/solvers/cif.py:15-492.
"""

from __future__ import annotations

import itertools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.parallel import shard_batch
from openasr_tpu.solvers import SOLVER_REGISTRY, Solver, array_fields
from openasr_tpu.utils import Timer

logger = logging.getLogger(__name__)


class CIFSolver(Solver):
    """loss = ce/n_tok + lambda_qua * qua/n_seq
    (reference: src/solvers/cif.py:15-96)."""

    def mix_losses(self, losses):
        lam_qua = float(self.config.get("lambda_qua", 1.0))
        return (
            losses["ce_loss"] / losses["n_tokens"]
            + lam_qua * losses["qua_loss"] / losses["n_seqs"]
        )


class CIFCTCSolver(Solver):
    """+ lambda_ctc * ctc/n_seq (reference: src/solvers/cif.py:99-181)."""

    def mix_losses(self, losses):
        lam_qua = float(self.config.get("lambda_qua", 1.0))
        lam_ctc = float(self.config.get("lambda_ctc", 1.0))
        return (
            losses["ce_loss"] / losses["n_tokens"]
            + lam_qua * losses["qua_loss"] / losses["n_seqs"]
            + lam_ctc * losses["ctc_loss"] / losses["n_seqs"]
        )


class CIFFCSolver(CIFCTCSolver):
    """Phone-level CIF_FC (reference: src/solvers/cif.py:184-253): same mix
    over the phone CE."""


class CIFMIXSolver(CIFCTCSolver):
    """CIF_MIX multitask: zips an 'acoustic' loader (feats+phones) with a
    cycled paired loader (feats+phones+chars).  The reference accumulates
    the two batches' backward passes into the SAME grads and then applies a
    single optimizer step (reference: src/solvers/cif.py:433-492 — two
    `loss.backward()` calls, one `optimizer.step()`).  Gradient of a sum
    equals the sum of gradients, so the grad-accumulation pair
    (Solver._build_accum_steps) reproduces that exactly: one accumulated
    gradient, ONE Adam update, one LR-schedule tick per iteration."""

    def __init__(self, model, config, tr_loader, cv_loader,
                 acoustic_loader=None, **kw):
        self.acoustic_loader = acoustic_loader
        super().__init__(model, config, tr_loader, cv_loader, **kw)

    def mix_losses(self, losses):
        base = super().mix_losses(losses)
        if "ce_char_loss" in losses:
            base = base + losses["ce_char_loss"] / losses["n_char_tokens"]
        return base

    def iter_one_epoch(self, cross_valid: bool = False) -> float:
        if cross_valid or self.acoustic_loader is None:
            return super().iter_one_epoch(cross_valid)

        timer = Timer()
        timer.tic()
        totals = ({}, None, None)  # device-side, base-loop policy

        params = self.model.params
        paired_cycle = itertools.cycle(iter(self.tr_loader))
        tot_iters = len(self.acoustic_loader)
        # reference: grads accumulate across `accumulate_grad_batch`
        # (acoustic, paired) iteration pairs and the optimizer steps on the
        # boundary — or at epoch end for the leftover remainder
        # (src/solvers/cif.py:430-503: `n_accu_batch -= 1; if n_accu_batch
        # == 0 or niter == tot_iter_num: ... optimizer.step()`)
        accum = max(1, int(self.config.get("accumulate_grad_batch", 1)))
        cur = self._accum_begin()
        for niter, ac_batch in enumerate(iter(self.acoustic_loader), start=1):
            if self._should_stop(niter):
                logger.warning(
                    "preemption: stopping epoch %d at batch %d/%d",
                    self.epoch, niter, tot_iters,
                )
                break
            self._maybe_profile()
            paired = next(paired_cycle)
            base_rng = jax.random.fold_in(self.rng, self.step * 8191 + niter)
            for j, batch in enumerate((ac_batch, paired)):
                arrays = shard_batch(array_fields(batch), self.mesh)
                loss, losses = self._accum_micro(
                    cur, params, arrays, jax.random.fold_in(base_rng, j)
                )
                totals = self._totals_update(totals, losses)
            params = self._accum_maybe_apply(
                cur, params, niter % accum == 0 or niter == tot_iters
            )

            if niter % self.print_inteval == 0:
                self._totals_log(totals, timer, niter, tot_iters, "train")

        return self._totals_close(totals)


SOLVER_REGISTRY.update({
    "CIF": CIFSolver,
    "ctc_cif": CIFCTCSolver,
    "CIF_FC": CIFFCSolver,
    "CIF_MIX": CIFMIXSolver,
})
