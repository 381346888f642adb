"""CIF solvers: loss mixing with lambda_qua / lambda_ctc, and the CIF_MIX
dual-loader epoch.

Capability parity with reference: src/solvers/cif.py:15-492.
"""

from __future__ import annotations

import itertools
import logging

import jax
import numpy as np

from openasr_tpu.parallel import shard_batch
from openasr_tpu.solvers import SOLVER_REGISTRY, Solver, array_fields

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
    cycled paired loader (feats+phones+chars) and sums both mixed losses per
    step (reference: src/solvers/cif.py:330-492 runs two backward passes
    into the same grads — summing the losses is gradient-identical)."""

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

        tot_main, tot_norm = 0.0, 0.0
        params = self.model.params
        paired_cycle = itertools.cycle(iter(self.tr_loader))
        for niter, ac_batch in enumerate(iter(self.acoustic_loader), start=1):
            paired = next(paired_cycle)
            for batch in (ac_batch, paired):
                arrays = shard_batch(array_fields(batch), self.mesh)
                rng = jax.random.fold_in(
                    self.rng, self.step * 8191 + niter
                )
                params, self.opt_state, loss, losses = self._train_step(
                    params, self.opt_state, arrays, rng
                )
                self.model.params = params
                tot_main += float(losses[self.main_loss_key])
                tot_norm += float(losses[self.main_loss_norm])
            self.step += 1
            if niter % self.print_inteval == 0:
                logger.info(
                    "Epoch %d | Step %d | mix loss %.3f | lr %.3e",
                    self.epoch, self.step, tot_main / max(tot_norm, 1.0),
                    self.current_lr(),
                )
        return tot_main / max(tot_norm, 1e-9)


SOLVER_REGISTRY.update({
    "CIF": CIFSolver,
    "ctc_cif": CIFCTCSolver,
    "CIF_FC": CIFFCSolver,
    "CIF_MIX": CIFMIXSolver,
})
