"""Attribute-regressor trainer (the reference's scene_regressor_256.py).

Trains ResNet-50 (fc -> 40 outputs) on Transient-Attributes-style scene
images: folder/*/* images, tab-separated label file ('dir/file\\tv,conf ...'),
train/test split lists, MSE loss, Adam 1e-4, 500 epochs, per-epoch test MSE,
checkpoints named {epoch+1:03d}_dict.model carrying model+optimizer state
(scene_regressor_256.py:27-171). Data rides the native threaded
decode/resize loader (native/l2i_native.cpp) with a PIL fallback; images
normalize to [-1, 1] like transforms.Normalize((.5,.5,.5), (.5,.5,.5)).

    python -m latent2im_tpu.cli.train_regressor \
        --data_dir <imageAlignedLD> --label_path <annotations.tsv> \
        --split_dir <random_split> [--image_size 256 --batch_size 32]
"""

from __future__ import annotations

import argparse
import csv
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import resnet as rn


def load_labelfile(path: str) -> dict[str, np.ndarray]:
    """'dir/file\\tv1,c1\\tv2,c2...' -> {key: [v1, v2, ...]}
    (scene_regressor_256.py:70-76)."""
    labels = {}
    with open(path) as csvfile:
        for line in csv.reader(csvfile, delimiter="\t"):
            if not line:
                continue
            labels[line[0]] = np.array(
                [float(i.split(",")[0]) for i in line[1:]], np.float32
            )
    return labels


def list_split(folder_path: str, split_file: str) -> list[tuple[str, str]]:
    """-> [(abs_path, 'dir/file' key)] filtered by the split list."""
    with open(split_file) as f:
        split = {line.strip() for line in f if line.strip()}
    out = []
    for p in glob.glob(os.path.join(folder_path, "*", "*")):
        key = "/".join(p.split("/")[-2:])
        if key in split:
            out.append((p, key))
    return sorted(out)


def _make_loader(paths: list[str], size: int, batch: int):
    try:
        from ..native import _l2i_native as nat

        return nat.Loader(paths, size, batch, threads=2), True
    except ImportError:
        return None, False


def _pil_batches(paths, size, batch, order):
    import PIL.Image

    for s in range(0, len(order), batch):
        idx = order[s : s + batch]
        imgs = []
        for i in idx:
            im = PIL.Image.open(paths[i]).convert("RGB")
            w, h = im.size
            dim = min(w, h)
            im = im.crop(((w - dim) // 2, (h - dim) // 2,
                          (w - dim) // 2 + dim, (h - dim) // 2 + dim))
            im = im.resize((size, size), PIL.Image.BILINEAR)
            imgs.append(np.asarray(im, np.uint8))
        yield np.stack(imgs), list(idx)


def make_steps(lr: float):
    tx = optax.adam(lr)

    @jax.jit
    def train_step(params, opt_state, imgs, labels):
        def loss_fn(p):
            preds, stats = rn.resnet50_forward(p, imgs, train=True)
            return jnp.mean((preds - labels) ** 2), stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = rn.apply_bn_stats(params, stats)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, imgs, labels):
        preds, _ = rn.resnet50_forward(params, imgs)
        return jnp.mean((preds - labels) ** 2)

    return tx, train_step, eval_step


def _normalize(u8_batch: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(u8_batch, jnp.float32) / 255.0 * 2.0 - 1.0


def main(argv=None):
    ap = argparse.ArgumentParser("scene regressor trainer")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--label_path", required=True)
    ap.add_argument("--split_dir", required=True)
    ap.add_argument("--ckpt_dir", default="./checkpoint_256")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_epochs", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num_outputs", type=int, default=40)
    ap.add_argument("--export_torch", action="store_true",
                    help="also save torch-layout {'model','optm'} checkpoints")
    args = ap.parse_args(argv)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    labels = load_labelfile(args.label_path)
    train_items = list_split(args.data_dir,
                             os.path.join(args.split_dir, "training.txt"))
    test_items = list_split(args.data_dir, os.path.join(args.split_dir, "test.txt"))
    print(f"train {len(train_items)} / test {len(test_items)} images")

    train_paths = [p for p, _ in train_items]
    train_labels = np.stack([labels[k] for _, k in train_items])
    test_paths = [p for p, _ in test_items]
    test_labels = np.stack([labels[k] for _, k in test_items])

    params = rn.init_resnet50(jax.random.PRNGKey(0), num_outputs=args.num_outputs)
    tx, train_step, eval_step = make_steps(args.lr)
    opt_state = tx.init(params)

    loader, native = _make_loader(train_paths, args.image_size, args.batch_size)
    print("native loader:", native)

    from ..io import checkpoint as ckpt

    for epoch in range(args.n_epochs):
        if native:
            loader.start_epoch(seed=epoch, shuffle=True)
            def batches():
                while True:
                    try:
                        raw, idx = loader.next_batch()
                    except StopIteration:
                        return
                    b = np.frombuffer(raw, np.uint8).reshape(
                        len(idx), args.image_size, args.image_size, 3
                    )
                    yield b, idx
            it = batches()
        else:
            order = np.random.RandomState(epoch).permutation(len(train_paths))
            it = _pil_batches(train_paths, args.image_size, args.batch_size, order)

        for bi, (u8, idx) in enumerate(it):
            imgs = _normalize(u8)
            lab = jnp.asarray(train_labels[np.asarray(idx)])
            params, opt_state, loss = train_step(params, opt_state, imgs, lab)
            if bi % 50 == 0:
                print(f"epoch {epoch} iter {bi} Loss: {float(loss):.5f}")

        if epoch % 1 == 0 and epoch != 0 and test_paths:
            test_losses = []
            for u8, idx in _pil_batches(
                test_paths, args.image_size, args.batch_size,
                np.arange(len(test_paths)),
            ):
                tl = eval_step(params, _normalize(u8),
                               jnp.asarray(test_labels[np.asarray(idx)]))
                test_losses.append(float(tl))
            print(f"Test epoch {epoch}; Loss: {np.mean(test_losses):.5f}")

        tag = str(epoch + 1).zfill(3)
        ckpt.save_pytree(
            os.path.join(args.ckpt_dir, f"{tag}_dict.model.msgpack"),
            {"model": params, "opt_state": opt_state},
            meta={"epoch": epoch},
        )
        if args.export_torch:
            import torch

            from ..io.torch_convert import export_resnet50_torch

            torch.save(
                {"model": export_resnet50_torch(params), "optm": {}},
                os.path.join(args.ckpt_dir, f"{tag}_dict.model"),
            )


if __name__ == "__main__":
    main()
