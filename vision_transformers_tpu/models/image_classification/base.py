"""Shared model base for the classification zoo.

The reference defines ``BaseTransformer`` (base.py:12-126) with device
autodetect and a generic ``train_model`` epoch loop — then every model file
pastes its own copy of the same loop. Here there is exactly one trainer
(training/trainer.py); this mixin gives every linen model the reference's
public ``train_model(model, train_loader, test_loader, epochs, val_loader)``
method returning the same metrics dict
({train,val,test}_{loss,accuracy} lists, base.py:124-126).

Device selection is not a model concern in JAX: jit places computation on the
default backend (TPU when present), replacing the reference's
mps→cuda→cpu probing (base.py:16-21) and the per-model 'cuda' overrides.
"""

from __future__ import annotations

from typing import Optional


class TrainableModel:
    """Mixin: reference-parity train_model API on top of the shared trainer."""

    def train_model(
        self,
        model=None,
        train_loader=None,
        test_loader=None,
        epochs: int = 1,
        val_loader=None,
        **kwargs,
    ):
        # The reference's signature passes the model explicitly
        # (vanilla_vit.py:217) even though it is always `self`; accept and
        # ignore it for drop-in compatibility.
        from vision_transformers_tpu.training.trainer import fit

        return fit(
            self,
            train_loader=train_loader,
            test_loader=test_loader,
            epochs=epochs,
            val_loader=val_loader,
            **kwargs,
        )
