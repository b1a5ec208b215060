"""Image/clip transforms.

Split host/device by what each is good at (reference pipelines:
`/root/reference/datasets/dataloader.py:155-197`):

  * HOST (per-sample, variable shapes): JPEG/mp4 decode, aspect-preserving
    shortest-side resize (PIL bicubic), the consistent-per-clip random/center
    224 crop.  Output: fixed-shape uint8 clips.
  * DEVICE (batched, fixed shapes, fused by XLA): horizontal flip, the
    aggressive second view (random 156-crop -> color jitter -> bicubic
    resize back to 224 -> flip), and ImageNet normalization.

The reference's two training views are: view1 = Resize(1.1x) -> RandomCrop
-> HFlip -> CenterCrop; view2 = RandomCrop(0.7x) -> ColorJitter(.5,.5,.5,.5)
-> Resize -> HFlip *applied to view1's output*.  We reproduce exactly that
dataflow, including torchvision ColorJitter's uniformly random per-sample
op order (a traced lax.scan over a drawn permutation — see color_jitter).

All device transforms take an explicit PRNG key and are vmappable/jittable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------- host side

def open_rgb(path):
    """Open an image as RGB PIL.Image, via the native libjpeg decoder when
    available (threaded C++ decode, no PIL object churn), else PIL."""
    from PIL import Image

    try:
        from avtubes import native

        if str(path).lower().endswith((".jpg", ".jpeg")) and native.available():
            arr = native.decode_jpeg(path)
            if arr is not None:
                return Image.fromarray(arr)
    except ImportError:
        pass
    return Image.open(path).convert("RGB")


def host_resize_shortest(img, size: int):
    """PIL aspect-preserving bicubic resize of the shortest side."""
    from PIL import Image

    from avtubes.native import shortest_side_dims

    w, h = img.size
    rh, rw = shortest_side_dims(h, w, size)
    return img.resize((rw, rh), Image.BICUBIC)


def host_center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return arr[top : top + size, left : left + size]


def host_random_crop_params(rng: np.random.RandomState, h: int, w: int, size: int):
    top = rng.randint(0, max(1, h - size + 1))
    left = rng.randint(0, max(1, w - size + 1))
    return top, left


def host_load_train_clip(paths, rng: np.random.RandomState, image_size: int = 224,
                         resize_factor: float = 1.1, threads: int = 1) -> np.ndarray:
    """Decode clip frames -> shortest-side resize (1.1x) -> one consistent
    random crop across all frames.  Returns uint8 (T, size, size, 3)."""
    target = int(image_size * resize_factor)
    native_mod = None
    try:
        from avtubes import native

        if native.available():
            native_mod = native
    except ImportError:
        pass
    crop = None
    if (native_mod is not None and len(paths) > 1
            and all(str(p).lower().endswith((".jpg", ".jpeg")) for p in paths)):
        # fused clip path: ONE C++ call decodes+resizes+crops every frame
        # (no per-frame Python round trip / second header parse; measured
        # neutral on the 1-core host — decode dominates — but it exposes an
        # intra-clip thread pool for many-core hosts).  Crop params come
        # from frame 0's resized geometry exactly as the per-frame path
        # computes them (same rng draw, same rounding), so the output is
        # bit-identical (tests/test_native.py pins it).
        size0 = native_mod.jpeg_size(paths[0])
        if size0 is not None:
            rh, rw = native_mod.shortest_side_dims(*size0, target)
            crop = host_random_crop_params(rng, rh, rw, image_size)
            clip = native_mod.decode_clip_train(paths, target, image_size,
                                                crop[0], crop[1],
                                                threads=threads, scaled=True)
            if clip is not None:
                return clip
            # fall through to the per-frame path, KEEPING the drawn crop
            # (the rng stream must not depend on which path succeeded)
    frames = []
    for p in paths:
        arr = None
        if native_mod is not None and str(p).lower().endswith((".jpg", ".jpeg")):
            # fused decode + shortest-side bicubic resize in C++ (no crop:
            # the random crop below must be consistent across the clip).
            # scaled=True: DCT-domain scaling, 2.6x faster; the ~2-level
            # pixel drift is far below the crop/jitter augmentation noise
            arr = native_mod.decode_jpeg_shortest(p, target, scaled=True)
        if arr is None:
            arr = np.asarray(host_resize_shortest(open_rgb(p), target))
        if crop is None:
            crop = host_random_crop_params(rng, arr.shape[0], arr.shape[1], image_size)
        top, left = crop
        frames.append(arr[top : top + image_size, left : left + image_size])
    return np.stack(frames)


def host_load_eval_frame(path, image_size: int = 224) -> np.ndarray:
    """Decode -> shortest-side resize to size -> center crop.  uint8 (H, W, 3).

    Hot path: the native fused decode+bicubic-resize+crop (one C++ call, no
    GIL — PIL's resize alone costs more than the JPEG decode) with a PIL
    fallback that computes the identical transform.
    """
    if str(path).lower().endswith((".jpg", ".jpeg")):
        try:
            from avtubes import native

            if native.available():
                # scaled=False: full-res decode, bit-comparable (<=1 level)
                # to the PIL path — eval inputs stay parity-grade
                out = native.decode_jpeg_shortest(path, image_size,
                                                  crop=image_size, scaled=False)
                if out is not None:
                    return out
        except ImportError:
            pass
    img = host_resize_shortest(open_rgb(path), image_size)
    return host_center_crop(np.asarray(img), image_size)


def eval_frame_from_bytes(data: bytes, image_size: int = 224,
                          fast: bool = False) -> np.ndarray:
    """`host_load_eval_frame` over an in-memory encoded image (serving
    requests arrive as bytes, not files): decode -> shortest-side bicubic
    resize -> center crop.  uint8 (size, size, 3).

    Default: PIL decode + the parity-grade resize/crop.  Measured on this
    host, the native full-res in-memory path is NOT faster single-threaded
    (4.8 vs 4.3 ms on a 480x640 photo-like JPEG — Pillow's resize is well
    optimized), so unlike the batched file loaders there is no default
    native win to take.

    fast=True: native fused decode with libjpeg DCT-domain M/8 scaling
    (`decode_jpeg_shortest_bytes(scaled=True)`) — 2.3 vs 4.3 ms on the same
    JPEG, ~2-level pixel drift vs the full-res decode (the PIL Image.draft
    tradeoff).  Serving exposes this as `--fast_decode`; metric cost is
    measured in DESIGN.md.  Non-JPEG payloads (PNG etc.) and native-lib
    absence fall back to the default path."""
    if fast:
        try:
            from avtubes import native

            if native.available():
                out = native.decode_jpeg_shortest_bytes(data, image_size,
                                                        crop=image_size,
                                                        scaled=True)
                if out is not None:
                    return out
        except ImportError:
            pass
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(data)).convert("RGB")
    img = host_resize_shortest(img, image_size)
    return host_center_crop(np.asarray(img), image_size)


def host_eval_clip(frames: np.ndarray, image_size: int = 224) -> np.ndarray:
    """Resize+center-crop an already-decoded (T,H,W,3) uint8 video (eval path)."""
    from PIL import Image

    out = []
    for f in frames:
        img = host_resize_shortest(Image.fromarray(f), image_size)
        out.append(host_center_crop(np.asarray(img), image_size))
    return np.stack(out)


# -------------------------------------------------------------- device side

def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] (..., H, W, 3) -> ImageNet-normalized float32."""
    x = x.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def hflip_clip(clip: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(clip, axis=-2)


def random_hflip(key: jax.Array, clip: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, hflip_clip(clip), clip)


def random_crop_clip(key: jax.Array, clip: jnp.ndarray, size: int) -> jnp.ndarray:
    """Consistent random crop across a (T, H, W, C) clip (static output shape)."""
    t, h, w, c = clip.shape
    top = jax.random.randint(key, (), 0, h - size + 1)
    left = jax.random.randint(jax.random.fold_in(key, 1), (), 0, w - size + 1)
    return jax.lax.dynamic_slice(clip, (0, top, left, 0), (t, size, size, c))


def resize_bicubic(clip: jnp.ndarray, size: int) -> jnp.ndarray:
    t, _, _, c = clip.shape
    return jax.image.resize(clip, (t, size, size, c), method="cubic")


def _grayscale(x: jnp.ndarray) -> jnp.ndarray:
    w = jnp.array([0.299, 0.587, 0.114], x.dtype)
    return (x * w).sum(-1, keepdims=True)


def _blend(a: jnp.ndarray, b: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


def color_jitter(key: jax.Array, clip01: jnp.ndarray,
                 brightness: float = 0.5, contrast: float = 0.5,
                 saturation: float = 0.5, hue: float = 0.5,
                 order: tuple[int, ...] | None = None) -> jnp.ndarray:
    """torchvision-semantics color jitter on a [0,1] float clip, one draw per
    clip: all four factors are drawn up front and the ops are applied in a
    uniformly random per-call order (torchvision's ColorJitter draws
    ``torch.randperm(4)`` each call, `datasets/dataloader.py:167` via
    transforms.ColorJitter).  The random order is traced as a 4-step
    lax.scan whose body lax.switches between the four ops — no Python
    control flow on traced values, so the whole jitter stays inside the
    fused augmentation program.

    `order`: optional STATIC permutation of (0=brightness, 1=contrast,
    2=saturation, 3=hue) that bypasses the random draw — for tests that
    need a deterministic composition.
    """
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    shift = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    def op_brightness(x):
        return _blend(x, jnp.zeros_like(x), fb)

    def op_contrast(x):
        mean = _grayscale(x).mean(axis=(-3, -2, -1), keepdims=True)
        return _blend(x, mean, fc)

    def op_saturation(x):
        return _blend(x, _grayscale(x), fs)

    def op_hue(x):
        return _hue_shift(x, shift)

    identity = lambda x: x
    ops = [op_brightness if brightness else identity,
           op_contrast if contrast else identity,
           op_saturation if saturation else identity,
           op_hue if hue else identity]

    if order is not None:
        x = clip01
        for idx in order:
            x = ops[idx](x)
        return x

    # Random-order traced path.  The per-sample order costs ~4.8 ms of the
    # recipe train step vs a static order (scripts/bench_train_attrib.py:
    # 142.0 vs 137.2 ms, co-tenant ~0.01) and the cost is STRUCTURAL, not
    # the duplicated branch work: a rewrite that split the permutation
    # around hue and ran the three affine ops as gated
    # clip(a*x + b*gray + c*mean(gray)) passes — hue computed once instead
    # of 4x under the vmapped switch — measured 142.0 vs the naive path's
    # 142.6, inside noise.  What the random order really buys is extra
    # full-tensor gated passes that XLA cannot fuse away, so the simple
    # form below stays; callers that don't need torchvision's random-order
    # parity pass a static `order` and recover the 4.8 ms (the
    # `jitter_order` knob in augment_train_batch / the trainers).
    perm = jax.random.permutation(kp, 4)

    def body(x, idx):
        return jax.lax.switch(idx, ops, x), None

    x, _ = jax.lax.scan(body, clip01, perm)
    return x


def _hue_shift(x: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Shift hue by `shift` (fraction of the full circle) via HSV round-trip."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rng_ = maxc - minc
    s = jnp.where(maxc > 0, rng_ / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng_, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(rng_ == 0, 0.0, h)
    h = (h + shift) % 1.0
    # HSV -> RGB
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # per-element pick via a where chain: jnp.choose lowers to general
    # gathers on TPU (measured 80 ms/step — 10x the whole fwd+bwd);
    # selects are pure VPU and fuse with the surrounding elementwise ops.
    def pick(opts):
        out = opts[-1]
        for k in range(len(opts) - 2, -1, -1):
            out = jnp.where(i == k, opts[k], out)
        return out

    r2 = pick([v, q, p, p, t, v])
    g2 = pick([t, v, v, q, p, p])
    b2 = pick([p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1)


@functools.partial(jax.jit, static_argnames=("image_size", "jitter_order"))
def augment_train_batch(key: jax.Array, clips_uint8: jnp.ndarray, image_size: int = 224,
                        jitter_order: str = "random"):
    """Device-side training augmentation for a (B, T, S, S, 3) uint8 batch.

    Returns (view1, view2), both ImageNet-normalized float32:
      view1 = random hflip of the host-cropped clip;
      view2 = RandomCrop(0.7*size) -> ColorJitter(.5,.5,.5,.5)
              -> bicubic resize to size -> random hflip, built from view1.

    `jitter_order`: 'random' applies the four jitter ops in a per-sample
    random order (torchvision parity, `datasets/dataloader.py:167`);
    'fixed' applies brightness->contrast->saturation->hue statically —
    same marginal distributions, measured 4.8 ms/step cheaper at the
    recipe shape (scripts/bench_train_attrib.py) because the per-sample
    order forces gated full-tensor passes XLA cannot fuse away.
    """
    b = clips_uint8.shape[0]
    crop_size = int(image_size * 0.7)
    order = None if jitter_order == "random" else (0, 1, 2, 3)

    def one(key, clip):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        v1 = random_hflip(k1, clip.astype(jnp.float32) / 255.0)
        v2 = random_crop_clip(k2, v1, crop_size)
        v2 = color_jitter(k3, v2, order=order)
        v2 = resize_bicubic(v2, image_size)
        v2 = random_hflip(k4, jnp.clip(v2, 0.0, 1.0))
        return v1, v2

    keys = jax.random.split(key, b)
    v1, v2 = jax.vmap(one)(keys, clips_uint8)
    norm = lambda x: (x - IMAGENET_MEAN) / IMAGENET_STD
    return norm(v1), norm(v2)
