"""Score-network registry (reference models/__init__.py:4-18)."""

from twoforone_tpu.models.graph_transformer import (  # noqa: F401
    GraphTransformer,
    score_forward,
    make_score_fn,
)


def get_model(config, num_beads: int) -> GraphTransformer:
    """Build the score network from a training config.

    ``config`` is anything with the reference flag names as attributes
    (TrainConfig, argparse Namespace, or a legacy args.pickle namespace).
    """
    backbone = getattr(config, "backbone_network", "graph-transformer")
    if backbone != "graph-transformer":
        raise ValueError(f"Network {backbone} not implemented")
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if getattr(config, "bf16", False) else jnp.float32
    return GraphTransformer(
        num_beads=num_beads,
        hidden_nf=config.hidden_features_gnn,
        n_layers=config.num_layers_gnn,
        use_intrinsic_coords=config.use_intrinsic_coords,
        use_abs_coords=config.use_abs_coords,
        use_distances=config.use_distances,
        conservative=config.conservative,
        dtype=dtype,
    )
