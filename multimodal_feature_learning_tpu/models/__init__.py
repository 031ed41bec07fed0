"""Model layer: flax.linen modules for the DVC families."""
