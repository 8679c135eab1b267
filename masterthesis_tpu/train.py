"""Training driver.

Parity with reference src/train.py:7-72 (Trainer.load_dataset/create_model/
train/run) with the TPU-native loop: the model's jitted step functions do all
device work; the trainer shards each host batch over the data mesh, folds the
iteration into the RNG, and handles print/save/display cadence.

Run: ``python -m masterthesis_tpu.train --dataroot ... --model AdaINModel ...``
"""
from __future__ import annotations

import jax

from masterthesis_tpu.arguments import TrainArguments
from masterthesis_tpu.data.loader import DataLoader, infinite, shard_batch
from masterthesis_tpu.parallel.mesh import make_mesh, replicate
from masterthesis_tpu.utils import TimerBlock


class Trainer:
    """Owns the host-side training loop; capability parity with reference
    train.py:7-67 but the loop body is one jitted device step per iteration."""

    def load_dataset(self, args):
        with TimerBlock("Building data pipeline") as block:
            block.log(f"Dataset: {args.dataset.__name__} at {args.dataroot}")
            dataset = args.dataset(args)
            block.log(f"Prefetching loader: batch={args.batch_size}, "
                      f"host shard {jax.process_index() + 1}/{jax.process_count()}")
            dataloader = DataLoader(
                dataset,
                batch_size=args.batch_size,
                shuffle=getattr(args, "shuffle", False),
                num_workers=args.num_workers,
                drop_last=True,
                # multi-host: each process feeds its disjoint slice
                shard_index=jax.process_index(),
                num_shards=jax.process_count(),
            )
        return dataloader

    def create_model(self, args):
        with TimerBlock("Creating model") as block:
            model = args.model(args)
            block.log("Initialize model")
            state = model.initialize()
            if getattr(args, "vgg_loss", None) is not None:
                block.log("Initialize perceptual loss")
                model.init_perceptual(weights_path=getattr(args, "vgg_weights", None))
        return model, state

    def train(self, args, model, state, dataloader, mesh=None):
        with TimerBlock("Training model") as block:
            global_iter = args.last_iter + 1 if args.resume_opt is not None else 0
            iterations = min(args.n_iters, args.max_iter)
            block.log(f"Running for {iterations} iterations")
            base_rng = jax.random.PRNGKey(getattr(args, "seed", 0))
            if mesh is not None:
                state = replicate(state, mesh)
            from masterthesis_tpu.utils.profiling import StepTimer

            timer = StepTimer(sync_every=max(1, args.print_freq))
            device_preproc = getattr(args, "device_preproc", False)
            imgs_per_item = None
            for batch in infinite(dataloader):
                if imgs_per_item is None:
                    # paired datasets carry x1/x2 per item, single datasets x
                    imgs_per_item = (
                        sum(1 for k in batch if k in ("x", "x1", "x2"))
                        if isinstance(batch, dict) else 1
                    )
                batch = shard_batch(batch, mesh)
                rng = jax.random.fold_in(base_rng, global_iter)
                if device_preproc:
                    from masterthesis_tpu.data.device_preproc import preprocess_pair_batch

                    rng, k = jax.random.split(rng)
                    batch = preprocess_pair_batch(
                        batch, k, args.load_size, args.crop_size,
                        train=True, no_flip=getattr(args, "no_flip", False),
                    )
                if getattr(args, "int8_train", False) and (
                    global_iter % max(1, args.int8_calib_freq) == 0
                    # resumed runs (last_iter+1 not a multiple of the freq)
                    # must calibrate immediately, or the steps until the next
                    # boundary would silently run plain bf16
                    or model._train_quant is None
                ):
                    # delayed scaling: refresh per-conv amax from this batch;
                    # the step consumes it as a dynamic jit arg (no recompile)
                    model.calibrate_quant_train(state, batch, rng)
                state, _ = model.optimize_parameters(state, batch, global_iter, rng)
                rate = timer.lap(model.loss)
                if rate is not None:
                    block.log(f"throughput: {rate:.2f} it/s "
                              f"({rate * imgs_per_item * args.batch_size:.1f} img/s)")
                if global_iter % args.print_freq == 0:
                    block.log("\n")
                    block.log(f"iter {global_iter} | lr {model.get_current_lr(state)}")
                    model.write_loss(global_iter)
                    block.log(model.print_losses())
                if global_iter % args.save_freq == 0:
                    block.log(f"checkpoint -> {args.checkpoint_dir}")
                    model.save(state, global_iter)
                if global_iter % args.display_freq == 0 and global_iter % args.d_iter == 0:
                    block.log("image grid -> display dir")
                    model.save_images(state, batch, global_iter, rng)
                global_iter += 1
                if global_iter > iterations:
                    block.log(f"final checkpoint -> {args.checkpoint_dir}")
                    model.save(state, global_iter)
                    block.log("training complete")
                    return state

    def run(self, args):
        mesh = make_mesh(getattr(args, "num_devices", None))
        dataloader = self.load_dataset(args)
        model, state = self.create_model(args)
        return self.train(args, model, state, dataloader, mesh)


if __name__ == "__main__":
    args = TrainArguments().parse()
    trainer = Trainer()
    trainer.run(args)
