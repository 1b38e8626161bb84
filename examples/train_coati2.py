"""COATI2 pretraining launcher (BEYOND-PARITY).

The reference ships COATI2 inference only (coati/models/simple_coati2/);
this launcher drives the reconstructed training recipe
(coati_tpu/training/train_coati2.py): property-token-conditioned AR +
directCLR over two SMILES serializations, on the coati2_12_12 vocabulary.

Usage:
    python examples/train_coati2.py --data_dir ./COATI_data [--dry_run]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="COATI2 pretraining")
    parser.add_argument("--data_dir", type=str, default="./")
    parser.add_argument("--output_dir", type=str, default="./logs/")
    parser.add_argument("--model_dir", type=str, default="./model_ckpts/")
    parser.add_argument("--resume_document", type=str, default=None)
    parser.add_argument("--orbax_dir", type=str, default=None,
                        help="enable orbax restart-from-latest")
    parser.add_argument("--dry_run", action="store_true",
                        help="synthetic one-epoch smoke run")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for a TPU pod slice")
    args = parser.parse_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    from coati_tpu.training.logger import COATILogger
    from coati_tpu.training.train_coati2 import Coati2TrainConfig, train_coati2

    # COATI2 grande: 512-d embedding, SwiGLU-resnet heads (README.md:23,
    # simple_coati2/transformer_only.py:49-62 defaults)
    config = Coati2TrainConfig(
        n_layer_xformer=16,
        n_hidden_xformer=512,
        embed_dim=512,
        n_head=16,
        n_seq=128,
        enc_to_coati="swiglu_resnet",
        n_direct_clr=64,
        batch_size=160,
        lr=5e-4,
        n_epochs=25,
        output_dir=args.output_dir,
        resume_document=args.resume_document,
        orbax_dir=args.orbax_dir,
    )

    import jax

    logger = None
    if jax.process_index() == 0:
        logger = COATILogger(
            model_name="coati2",
            output_path=config.output_dir,
            model_path=args.model_dir,
            args=config.as_dict(),
            dataset="",
        )
        logger.start()

    if args.dry_run:
        from examples.train_grande import SyntheticDataset

        config.n_epochs = 1
        config.batch_size = 8
        config.n_layer_xformer = 2
        config.n_hidden_xformer = 64
        config.embed_dim = 64
        config.n_head = 4
        params, results = train_coati2(
            config, SyntheticDataset(), logger=logger, max_steps_per_epoch=4
        )
    else:
        from coati_tpu.data.dataset import COATI_dataset

        dataset = COATI_dataset(cache_dir=args.data_dir)
        params, results = train_coati2(config, dataset, logger=logger)
    print("training complete;", results)


if __name__ == "__main__":
    main()
