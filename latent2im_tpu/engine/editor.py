"""The editing engine: frozen towers + walk, as pure jitted functions.

Replaces the reference's stateful ``TransformGraph`` god-object (reference:
graphs/stylegan_v2_real/transform_base.py:246-936, graphs/pggan/
transform_base.py:211-824) with an ``Editor`` that closes over the frozen
G/D/R/VGG parameter pytrees and exposes the same capability surface as pure
functions of (walk_params, inputs):

    get_w           z -> W+ stack [B, L, D]         (:372-378)
    synthesize      latent -> image NHWC            (:345-357)
    regress         image -> attr scores [B, A]     (:396-403)
    unified_alphas  (org, sampled) -> (target, delta) — heals the stylegan
                    (delta-only, :405-410) vs pggan (clamped-target tuple,
                    pggan :358-364) API split; both trainers use this one.
    edit            walk application                (:380-386)
    apply_alpha     inference edit: regress-current, delta-to-target, walk,
                    synthesize (:554-603), jitted, no host sync
    sweep           batched panel sweep for vis/eval — panels fold into the
                    batch dimension and synthesize in chip-filling chunks
                    instead of the reference's Python loop (:620-627)

The PGGAN backend differences are captured here too: G(z) output is bilinear-
downsampled x0.5 (pggan :311-321) and D scores a x2 re-upsampled image
(pggan :480).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..models import stylegan2 as sg2
from ..walks import walks as W

# Default synthesis program width for panel sweeps: the edit-pipeline bench
# peaks at batch 32 at 1024px (bench.py BATCH); larger chunks only grow peak
# activation memory.
SWEEP_CHUNK = 32


def _balanced_chunk(n: int, cap: int) -> int:
    """Chunk width ≤ cap that balances n across ceil(n/cap) programs —
    ceil(48/32)=2 chunks of 24 instead of 32+16-padded-to-32 (a measured 25%
    synthesis-slot waste at vis batch 8, P=6)."""
    n_chunks = -(-n // cap)
    return -(-n // n_chunks)


def _u8_graph(img):
    """In-graph uint8 conversion, exact utils.image.to_uint8 clip+truncate
    semantics ((x+1)*127.5 is single-rounding-equivalent to the host's
    ((x+1)/2)*255; pinned by the u8 parity tests). The ONE definition every
    u8=True path shares."""
    return jnp.clip(
        (img.astype(jnp.float32) + 1.0) * 127.5, 0.0, 255.0
    ).astype(jnp.uint8)


# Donated placement of one synthesis chunk into the preallocated result
# stack: buf is donated, so XLA updates it in place — peak residency stays
# at (stack + one chunk) instead of the ~2x-stack transient a final
# jnp.concatenate over all chunks would hold. `start` is a traced scalar:
# one compile per (stack, chunk) shape pair, not per chunk index.
_place_chunk = jax.jit(
    lambda buf, chunk_imgs, start: jax.lax.dynamic_update_slice_in_dim(
        buf, chunk_imgs, start, 0
    ),
    donate_argnums=0,
)


@dataclasses.dataclass(frozen=True)
class EditorConfig:
    model: str = "stylegan_v2_real"
    latent: str = "w"  # 'w' | 'z'
    walk_kind: str = "linear_w"
    attr_list: tuple[str, ...] = ("Smiling",)
    attr_idx: tuple[int, ...] = (31,)
    size: int = 256
    dim_z: int = 512
    layers: tuple[int, ...] | None = None
    alpha_mode: str = "target"  # 'target' (stylegan) | 'delta' (pggan)
    no_content_loss: bool = False
    no_gan_loss: bool = False
    stable_bce: bool = False
    fixed_noise: bool = False  # True = stored noise buffers during training
    # Bilinear-resize images to this size before regression (None = feed the
    # generator resolution, the reference's behavior). The CelebA/scene
    # regressors are trained at 256 (scene_regressor_256.py); feeding a
    # 1024px G's output at its trained resolution is statistically truer AND
    # ~16x cheaper — opt-in because it changes reported attribute scores.
    reg_input_size: int | None = None
    # Bilinear-resize BOTH images to this size before the VGG content loss
    # (None = compare at generator resolution, the reference's behavior,
    # transform_base.py:407-414). The round-5 1024px train profile shows the
    # full-res VGG tower is the single largest cost block of the step; at
    # 256 the content term keeps its perceptual meaning at ~1/16 the FLOPs.
    # Opt-in because it changes the loss definition (BASELINE.md ledger).
    content_input_size: int | None = None
    compute_dtype: Any = jnp.float32
    kernel_impl: str | None = None  # None|'xla'|'pallas' for ops dispatch
    # Rematerialize the edited-path G forward in the train step's backward:
    # trades one extra G forward for not storing its activations — unlocks
    # larger training batches when HBM-bound. True/'all' = one jax.checkpoint
    # around the whole forward; 'block' = per-synthesis-block checkpoints
    # (same recompute FLOPs, strictly lower peak backward memory).
    remat_g: bool | str = False
    # Rematerialize the loss towers (R regression of the edit, VGG content
    # loss, D realism) in the backward: each tower's full-res activations are
    # recomputed instead of stored, so the backward holds ONE tower's
    # residuals at a time instead of all three + G's. At 1024px the towers,
    # not G, are the memory floor (remat_g alone still fails to compile at
    # B>=12 — BASELINE.md grid); composes with remat_g.
    remat_towers: bool = False

    @property
    def n_latent(self) -> int:
        return sg2.n_latent(self.size)


class Editor:
    """Capability surface over frozen towers. All public methods are pure in
    (walk_params, data); heavyweight paths are jitted with the frozen towers
    passed as device ARGUMENTS (never closed over — see _jit)."""

    def __init__(
        self,
        cfg: EditorConfig,
        g_params,
        reg_params,
        vgg_params=None,
        d_params=None,
        synth_fn: Callable | None = None,
        disc_fn: Callable | None = None,
        map_fn: Callable | None = None,
    ):
        """synth_fn/disc_fn/map_fn inject a non-StyleGAN2 backend (e.g. PGGAN:
        see engine/build.py) without subclassing. synth_fn(g_params, latent)
        and disc_fn(d_params, img) receive the CURRENT tower params so the
        frozen_params()/with_params() jit-argument contract holds for every
        backend (a closure over the params would embed the full tower as HLO
        constants and silently ignore with_params overrides)."""
        self.cfg = cfg
        self.g_params = g_params
        self.reg_params = reg_params
        self.vgg_params = vgg_params
        self.d_params = d_params
        self._synth_fn = synth_fn
        self._disc_fn = disc_fn
        self._map_fn = map_fn
        self._jit_cache: dict[str, Callable] = {}

    def with_params(self, frozen: dict) -> "Editor":
        """A lightweight copy with substituted frozen param trees. Used by the
        train step to pass the big frozen towers as jit ARGUMENTS rather than
        closures — closures embed every weight as an HLO constant, which
        bloats the program (the axon compile tunnel rejects the full-size
        step outright). Injected synth/disc closures keep their captures."""
        vgg = frozen.get("vgg")
        if vgg is not None:
            # re-attach the static cfg-name leaf stripped by frozen_params
            vgg = {"cfg": self.vgg_params["cfg"], **vgg}
        elif self.vgg_params is not None:
            vgg = self.vgg_params
        ed = Editor(
            self.cfg,
            frozen.get("g", self.g_params),
            reg_params=frozen.get("reg", self.reg_params),
            vgg_params=vgg,
            d_params=frozen.get("d", self.d_params),
            synth_fn=self._synth_fn,
            disc_fn=self._disc_fn,
            map_fn=self._map_fn,
        )
        return ed

    def frozen_params(self) -> dict:
        out = {"g": self.g_params, "reg": self.reg_params}
        if self.vgg_params is not None:
            # drop the string cfg leaf (not a valid jit argument)
            out["vgg"] = {k: v for k, v in self.vgg_params.items() if k != "cfg"}
        if self.d_params is not None:
            out["d"] = self.d_params
        return out

    # -- building blocks (traceable) --------------------------------------

    def get_w(self, z):
        """z -> W+ [B, n_latent, D] (style MLP output tiled per layer)."""
        if self._map_fn is not None:
            return self._map_fn(z)
        w = sg2.style_forward(self.g_params, z, impl=self.cfg.kernel_impl)
        return jnp.repeat(w[:, None, :], self.cfg.n_latent, axis=1)

    def synthesize(self, latent, noise_key=None, block_remat=False):
        """W+ [B, L, D] (latent='w') or z [B, D] (latent='z') -> image NHWC.

        noise_key: optional PRNG key for fresh per-layer noise injection (the
        reference generator's randomize_noise=True default, networks.py:
        281-286 and :476-483); None uses the fixed stored buffers
        (deterministic — the parity/vis mode). Backends without noise
        injection (PGGAN) ignore it.

        block_remat: jax.checkpoint each synthesis block individually (exact
        values/grads, lowest peak backward memory — see sg2.synthesize).
        Injected synth_fn backends have no block structure to hook; they
        degrade to one whole-forward jax.checkpoint.
        """
        cfg = self.cfg
        if self._synth_fn is not None:
            fn = self._synth_fn
            if block_remat:
                fn = jax.checkpoint(fn)
            return fn(self.g_params, latent)
        noise = None
        if noise_key is not None:
            noise = sg2.make_noise(
                self.g_params, noise_key, latent.shape[0], cfg.size
            )
        if cfg.latent == "w":
            return sg2.synthesize(
                self.g_params, latent, noise=noise, impl=cfg.kernel_impl,
                dtype=cfg.compute_dtype, block_remat=block_remat
            )
        return sg2.generator_forward(
            self.g_params, latent, noise=noise, impl=cfg.kernel_impl,
            dtype=cfg.compute_dtype, block_remat=block_remat
        )

    def _reg_input(self, img):
        s = self.cfg.reg_input_size
        if s and img.shape[1] != s:
            img = _bilinear_resize(img, s, s)
        return img

    def _content_input(self, img):
        s = self.cfg.content_input_size
        if s and img.shape[1] != s:
            img = _bilinear_resize(img, s, s)
        return img

    def regress(self, img):
        """image -> scores at the configured attribute indices [B, A]."""
        from ..models import resnet as rn

        preds, _ = rn.resnet50_forward(
            self.reg_params, self._reg_input(img), dtype=self.cfg.compute_dtype
        )
        return preds[:, jnp.asarray(self.cfg.attr_idx)]

    def regress_all(self, img):
        from ..models import resnet as rn

        preds, _ = rn.resnet50_forward(
            self.reg_params, self._reg_input(img), dtype=self.cfg.compute_dtype
        )
        return preds

    def discriminate(self, img):
        if self._disc_fn is not None:
            return self._disc_fn(self.d_params, img)
        return sg2.discriminator_forward(
            self.d_params, img, impl=self.cfg.kernel_impl, dtype=self.cfg.compute_dtype
        )

    def unified_alphas(self, alpha_org, sampled):
        """-> (alpha_target, alpha_delta).

        'target' mode: sampled IS the target (stylegan trainers feed it to the
        BCE); 'delta' mode: sampled is a step, target = clamp(org + step, 0, 1)
        (pggan transform_base.py:358-364).
        """
        if self.cfg.alpha_mode == "delta":
            target = jnp.clip(alpha_org + sampled, 0.0, 1.0)
            return target, target - alpha_org
        return sampled, sampled - alpha_org

    def edit(self, walk_params, latent, alpha, **kw):
        return W.apply_walk(
            self.cfg.walk_kind, walk_params, latent, alpha,
            layers=self.cfg.layers, **kw
        )

    # -- jitted inference paths -------------------------------------------

    def _jit(self, name, fn):
        """Compile fn(ed, *args) with the frozen towers passed as a jit
        ARGUMENT (ed = this editor rebound via with_params inside the
        trace). A closure would embed every tower weight as an HLO constant
        — at 1024px that's a >100MB program payload the axon compile tunnel
        rejects (the same rule the train steps follow, train.py:75-78)."""
        # a program traced under one spatial-partitioning hint must not be
        # reused under another (parallel/spatial.py installs the hint)
        name = f"{name}_sp{sg2.spatial_token()}"
        if name not in self._jit_cache:

            def wrapped(frozen, *args):
                return fn(self.with_params(frozen), *args)

            self._jit_cache[name] = jax.jit(wrapped)
        jitted = self._jit_cache[name]
        frozen = self._frozen_device()
        return lambda *args: jitted(frozen, *args)

    def _frozen_device(self):
        """Device copy of the frozen towers shared by every jitted inference
        path; re-issued when a tower object is swapped (checkpoint load,
        replicate_editor). The cache entry RETAINS the host trees it was
        keyed on: an id()-only key could otherwise serve stale device weights
        after a swapped-out tree is freed and CPython reuses its id."""
        towers = (self.g_params, self.reg_params, self.vgg_params,
                  self.d_params)
        key = tuple(id(t) for t in towers)
        cached = getattr(self, "_frozen_dev_cache", None)
        if cached is None or cached[0] != key:
            # no-op for arrays already on device (incl. mesh-replicated ones)
            self._frozen_dev_cache = (
                key, towers, jax.device_put(self.frozen_params())
            )
        return self._frozen_dev_cache[2]

    def _require_alpha_walk(self, path: str) -> None:
        """The 'embed' walk (WalkEmbed, transform_base.py:21-41) ignores
        alpha entirely — an alpha-driven panel sweep over it would render P
        identical images. The reference has no working inference path for it
        either: its w-path drops name/index_ before the walk call
        (transform_base.py:381-387, a TypeError) and its z-path with the
        vis default index_=None broadcasts a [6,1,D] bank slice into the
        latent (transform_base.py:35-41, shape garbage). Fail loudly and
        point at the explicit-index route instead of silently editing with
        bank entry 0."""
        if self.cfg.walk_kind == "embed":
            raise ValueError(
                f"{path} is alpha-driven and the 'embed' walk ignores alpha "
                "(reference WalkEmbed.forward drops it); use "
                "compat.get_z_new_tensor(..., index_=<bank index>) to apply "
                "a specific bank entry"
            )

    def _bank_position(self, index) -> int:
        """Regressor-table attribute id -> column in the trained bank;
        raises for ids the bank wasn't trained on (silent mis-edits are
        worse; the reference's attrIdx.index raises too)."""
        if index in self.cfg.attr_idx:
            return self.cfg.attr_idx.index(index)
        raise ValueError(
            f"attribute index {index} not in the trained bank "
            f"{self.cfg.attr_idx}"
        )

    def apply_alpha(self, walk_params, z, alpha_to_graph, given_w=None,
                    index=None, u8: bool = False):
        """Inference-time edit (transform_base.py:554-603).

        Regress the current attribute scores, compute the delta to the
        requested target, walk, re-synthesize. `index` reproduces the
        reference's per-attribute masking branch: with a full attribute bank
        every column moves toward the target; with a sub-bank only the
        matching column is overridden.

        u8=True converts the returned images to uint8 IN-GRAPH (exact
        utils.image.to_uint8 clip+truncate semantics) — 4x smaller output
        buffers and, critically for serving, a 4x smaller device→host fetch
        per request (BASELINE.md serving section).

        Returns (edited_img, alpha_org, orig_img).
        """
        self._require_alpha_walk("apply_alpha")
        # reference branch (:576-583): `index` is a regressor-table attribute
        # id, mapped through the bank's attr_idx (an untrained id raises)
        idx_pos = None if index is None else self._bank_position(index)

        def _u8(img):
            return _u8_graph(img) if u8 else img

        def run(ed, wp, z, ag, gw):
            if ed.cfg.latent == "z":
                latent = z if gw is None else gw
            else:
                latent = ed.get_w(z) if gw is None else gw
            orig = ed.synthesize(latent)
            alpha_org = ed.regress(orig)
            if ed.cfg.latent == "z":
                edited = ed.synthesize(ed.edit(wp, latent, ag))
                return _u8(edited), alpha_org, _u8(orig)
            delta = ag - alpha_org
            if idx_pos is not None:
                delta = delta.at[:, idx_pos].set(
                    (ag[:, 0] if ag.shape[1] == 1 else ag[:, idx_pos])
                    - alpha_org[:, idx_pos]
                )
            edited = ed.synthesize(ed.edit(wp, latent, delta))
            return _u8(edited), alpha_org, _u8(orig)

        fn = self._jit(f"apply_alpha_{given_w is None}_{idx_pos}_u8{u8}", run)
        ag = jnp.asarray(alpha_to_graph, jnp.float32)
        if ag.ndim == 1:
            ag = ag[:, None]
        return fn(walk_params, jnp.asarray(z), ag, given_w)

    def _synthesize_stream(self, latents, chunk: int, u8: bool = False):
        """Synthesize a flattened [N, ...] latent stack via HOST-dispatched
        device programs of width `chunk` (N padded up to a multiple; pad rows
        discarded). Each chunk is its own XLA program with its own (small)
        output buffer, placed into one preallocated (donated, in-place)
        result stack — so no program ever holds more than one chunk's
        activations, and peak residency is the result stack + one chunk — the
        round-4 one-giant-program form (a lax.map over chunks returning all
        N f32 images) OOM'd beyond width 10 at 1024px and the first
        RESOURCE_EXHAUSTED wedged the axon backend for the rest of the
        process (BASELINE.md). Dispatch is async, so chunks still pipeline on
        the device queue; the chunked form exists because a width-B program
        starved the MXU at vis/eval's B=1..2 (measured 103 panel-img/s vs the
        edit pipeline's 276 syntheses/s; BENCH_r04).

        u8=True converts to uint8 IN-GRAPH (same clip+truncate semantics as
        utils.image.to_uint8), shrinking every output buffer — and any
        device→host fetch — 4x."""
        n = latents.shape[0]

        def synth(ed, lat):
            img = ed.synthesize(lat)
            return _u8_graph(img) if u8 else img

        fn = self._jit(f"sweep_synth_u8{u8}", synth)
        if chunk >= n:
            return fn(latents)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        if pad:
            latents = jnp.concatenate([latents, latents[:pad]], axis=0)
        # Assemble chunks into a preallocated [n, ...] stack via donated
        # dynamic-update-slice placements (bounds residency at stack + one
        # chunk; a jnp.concatenate over all chunks is ONE program holding
        # every chunk plus the full stack — ~2x the stack transiently, the
        # regime this streaming form exists to avoid). Pad rows are dropped
        # by placing only the tail's real width.
        buf = None
        for i in range(n_chunks):
            out = fn(latents[i * chunk:(i + 1) * chunk])
            if buf is None:
                buf = jnp.zeros((n,) + out.shape[1:], out.dtype)
            w = min(chunk, n - i * chunk)
            buf = _place_chunk(buf, out[:w] if w < chunk else out, i * chunk)
        return buf

    def sweep(self, walk_params, z, panel_alphas, given_w=None,
              chunk: int | None = None, u8: bool = False):
        """All-panels edit: returns images [P, B, ...] plus
        (alpha_org, orig_img). Replaces the host loop at
        transform_base.py:620-627.

        The P panels are flattened into the batch dimension — the latent is
        computed once and broadcast in a small prep program (walk math +
        orig synthesis + regression), then the edited latents stream through
        host-dispatched chip-filling synthesis programs of width `chunk`
        (default SWEEP_CHUNK; panels pad up to a multiple) — so the generator
        always sees a chip-filling batch even at the B=1..2 sizes vis/eval
        use, and no single program holds the full P*B image stack.

        u8=True returns uint8 images converted in-graph (4x smaller buffers;
        exact to_uint8 semantics) — the vis/serve path."""
        self._require_alpha_walk("sweep")
        pa = jnp.asarray(panel_alphas, jnp.float32)
        if pa.ndim == 2:
            pa = pa[:, :, None]
        p, b = int(pa.shape[0]), int(pa.shape[1])
        c = chunk or _balanced_chunk(p * b, SWEEP_CHUNK)

        def prep(ed, wp, z, alphas, gw):
            if ed.cfg.latent == "z":
                latent = z if gw is None else gw
            else:
                latent = ed.get_w(z) if gw is None else gw
            orig = ed.synthesize(latent)
            alpha_org = ed.regress(orig)
            if ed.cfg.latent == "z":
                walk_alpha = alphas                     # [P, B, A]
            else:
                walk_alpha = alphas - alpha_org[None]   # delta to target
            flat_alpha = walk_alpha.reshape((p * b,) + walk_alpha.shape[2:])
            flat_latent = jnp.broadcast_to(
                latent[None], (p,) + latent.shape
            ).reshape((p * b,) + latent.shape[1:])
            edited = ed.edit(wp, flat_latent, flat_alpha)
            return edited, alpha_org, orig

        fn = self._jit(f"sweep_prep_{given_w is None}_{p}_{b}", prep)
        edited, alpha_org, orig = fn(walk_params, jnp.asarray(z), pa, given_w)
        imgs = self._synthesize_stream(edited, c, u8=u8)
        return imgs.reshape((p, b) + imgs.shape[1:]), alpha_org, orig

    def apply_alpha_combine(self, walk_params, z, alphas_per_attr, indices,
                            given_w=None):
        """Two-(or N-)attribute combined edit (transform_base.py:769-811): the
        delta starts at zero and only the listed attribute columns move toward
        their targets. alphas_per_attr: list of [B] or [B,1] arrays aligned
        with `indices` (regressor-table indices)."""
        positions = tuple(self._bank_position(i) for i in indices)

        def run(ed, wp, z, ags, gw):
            latent = ed.get_w(z) if gw is None else gw
            orig = ed.synthesize(latent)
            alpha_org = ed.regress(orig)
            delta = jnp.zeros_like(alpha_org)
            for pos, ag in zip(positions, ags):
                delta = delta.at[:, pos].set(ag[:, 0] - alpha_org[:, pos])
            edited = ed.synthesize(ed.edit(wp, latent, delta))
            return edited, alpha_org, orig

        fn = self._jit(f"apply_combine_{positions}_{given_w is None}", run)
        ags = tuple(
            jnp.asarray(a, jnp.float32).reshape(-1, 1) for a in alphas_per_attr
        )
        return fn(walk_params, jnp.asarray(z), ags, given_w)

    def sweep_combine(self, walk_params, z, panel_alphas, indices,
                      given_w=None, u8: bool = False):
        """All (alpha_i, alpha_j) pairs for a 2-attribute grid
        (transform_base.py:814-869): returns images [P, P, B, H, W, C].

        Same structure as `sweep`: one small prep program (latent/orig/
        alpha_org + the flattened P*P edited-latent grid), then host-
        dispatched chip-filling synthesis chunks."""
        import numpy as np

        positions = tuple(self._bank_position(i) for i in indices)
        panels = np.asarray(panel_alphas, np.float32)
        p = len(panels)
        grid = np.stack(
            [np.repeat(panels, p), np.tile(panels, p)], axis=1
        )  # [P*P, 2] row-major (a1 outer, a2 inner)

        def prep(ed, wp, z, grid, gw):
            latent = ed.get_w(z) if gw is None else gw
            b = latent.shape[0]
            orig = ed.synthesize(latent)
            alpha_org = ed.regress(orig)
            n = grid.shape[0]  # P*P
            delta = jnp.zeros((n, b, alpha_org.shape[1]), alpha_org.dtype)
            for k, pos in enumerate(positions):
                delta = delta.at[:, :, pos].set(
                    grid[:, k, None] - alpha_org[None, :, pos]
                )
            flat_delta = delta.reshape(n * b, -1)
            flat_latent = jnp.broadcast_to(
                latent[None], (n,) + latent.shape
            ).reshape((n * b,) + latent.shape[1:])
            edited = ed.edit(wp, flat_latent, flat_delta)
            return edited, alpha_org, orig

        fn = self._jit(f"sweep_combine_{positions}_{given_w is None}", prep)
        edited, alpha_org, orig = fn(
            walk_params, jnp.asarray(z), jnp.asarray(grid), given_w
        )
        b = alpha_org.shape[0]
        imgs = self._synthesize_stream(
            edited, _balanced_chunk(p * p * b, SWEEP_CHUNK), u8=u8
        )
        imgs = imgs.reshape((p * p, b) + imgs.shape[1:])
        return imgs.reshape(p, p, *imgs.shape[1:]), alpha_org, orig


def _bilinear_resize(img, h, w):
    """F.upsample(mode='bilinear', align_corners=False) equivalent."""
    return jax.image.resize(img, (img.shape[0], h, w, img.shape[3]), "linear")


def clip_ims(ims) -> "np.ndarray":
    """[-1,1] float -> uint8 (transform_base.py:551-552). Host-side.

    Alias of utils.image.to_uint8 under the reference's method name."""
    from ..utils.image import to_uint8

    return to_uint8(ims)
