"""Run the positive-control experiment (train -> sample -> evaluate on the
synthetic 4-basin system) at full budget on the TPU; prints the metric dict.

    python scripts/positive_control.py [train_iter] [num_samples]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from twoforone_tpu.train.positive_control import run_positive_control
    from twoforone_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # Defaults = the measured-green recipe of docs/POSITIVE_CONTROL.md.
    train_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 80000
    num_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    results = run_positive_control(
        train_iter=train_iter,
        n_data=200000,
        batch_size=1024,
        hidden_nf=64,
        n_layers=3,
        learning_rate=6e-4,
        num_samples=num_samples,
        langevin_chains=256,
        langevin_steps=30000,
        langevin_save_interval=100,
    )
    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
