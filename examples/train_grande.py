"""Grande pretraining launcher.

TPU-native equivalent of examples/training/train_grande.py: instead of
MASTER_ADDR/mp.spawn/NCCL, one process per host drives all local devices
through the data mesh; multi-host pods initialize jax.distributed from
the environment.

Usage:
    python examples/train_grande.py --data_dir ./COATI_data [--dry_run]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="COATI grande pretraining")
    parser.add_argument("--data_dir", type=str, default="./")
    parser.add_argument("--output_dir", type=str, default="./logs/")
    parser.add_argument("--model_dir", type=str, default="./model_ckpts/")
    parser.add_argument("--resume_document", type=str, default=None)
    parser.add_argument(
        "--dry_run", action="store_true",
        help="synthetic one-epoch smoke run without the 340GB corpus",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed for a TPU pod slice",
    )
    args = parser.parse_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    from coati_tpu.training.config import grande_config
    from coati_tpu.training.logger import COATILogger
    from coati_tpu.training.train import train_autoencoder

    config = grande_config(
        data_dir=args.data_dir,
        output_dir=args.output_dir,
        model_dir=args.model_dir,
        resume_document=args.resume_document,
    )

    import jax

    logger = None
    if jax.process_index() == 0:
        logger = COATILogger(
            model_name="e3gnn_smiles_clip_e2e",
            output_path=config.output_dir,
            model_path=config.model_dir,
            args=config.as_dict(),
            dataset="",
        )
        logger.start()

    if args.dry_run:
        dataset = SyntheticDataset()
        config.n_epochs = 1
        config.batch_size = 8
        params, results = train_autoencoder(
            config, dataset, logger=logger, max_steps_per_epoch=4
        )
    else:
        from coati_tpu.data.dataset import COATI_dataset

        dataset = COATI_dataset(cache_dir=config.data_dir)
        params, results = train_autoencoder(config, dataset, logger=logger)
    print("training complete;", results["best_test"])


class SyntheticDataset:
    """Tiny random-SMILES corpus for smoke runs."""

    summary = {"dataset_type": "synthetic"}

    def get_data_pipe(self, batch_size=8, partition="train", required_fields=(),
                      xform_routine=lambda x: x, **kw):
        import numpy as np

        from coati_tpu.data.batch_pipe import batch_rows

        rng = np.random.default_rng(0)
        frags = ["C", "CC", "CCO", "c1ccccc1", "CCN", "CC(=O)O", "CCCC"]

        def rows():
            for i in range(batch_size * 8):
                smi = frags[i % len(frags)]
                n = max(1, len(smi))
                yield {
                    "smiles": smi,
                    "source_collection": "geom_drugs",
                    "atoms": rng.integers(1, 9, size=(n,)).astype(np.float64),
                    "coords": rng.normal(size=(n, 3)),
                }

        return batch_rows(
            rows(), batch_size=batch_size, partition="raw",
            xform_routine=xform_routine, required_fields=["smiles"],
        )


if __name__ == "__main__":
    main()
