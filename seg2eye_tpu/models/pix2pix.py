"""Pix2Pix (Seg2Eye) model orchestration: pure-functional loss computation.

Mirrors models/pix2pix_model.py of the reference, re-expressed as pure
functions over explicit flax variable collections so the whole G/D step jits
into single XLA programs.

Parity notes:
  * k-style encoding: the reference loops netE over every sample's k style
    images in Python (pix2pix_model.py:285) and mean/max-aggregates mu and the
    feature maps over k (pix2pix_model.py:271-305).  Here the (B,k) axes are
    flattened into one fused encoder batch — identical math, one XLA call.
  * discriminate(): fake and real are concatenated into one 2B batch before D
    (pix2pix_model.py:328-342) and split per-layer after (divide_pred,
    pix2pix_model.py:345-358).
  * generator loss = GAN + optional L2/L1/OpenEDS + style-consistency
    (w/feat/gram) + D-feature-matching (pix2pix_model.py:186-247).  The
    reference's `.detach()` calls on the fake latent/features are no-ops
    (results unassigned) — gradients flow through both sides; reproduced.
  * discriminator loss = hinge on fake & real with fake re-generated under
    stop-gradient (pix2pix_model.py:249-264).
  * VGGLoss is referenced but undefined in the fork (dead code; SURVEY §2
    C10): no_vgg_loss defaults True for parity, but the loss itself IS
    implemented properly per SURVEY §7.3 (models/vgg.py — SPADE's five-slice
    VGG19 L1; weights loaded via --vgg_weights, frozen, never optimized).
  * The raw-vs-weighted loss log side channel (pix2pix_model.py:49-59) is
    reproduced by returning `raw` entries alongside weighted ones.

Mutable state: 'spectral' (power-iteration u vectors) and 'batch_stats'
(SPADE param-free BN running stats) follow torch train-mode semantics: they
update on every training forward, including D's forward inside the G step and
G's no-grad forward inside the D step.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator
from seg2eye_tpu.models.encoder import ConvEncoder
from seg2eye_tpu.models.generator import SpadeStyleGenerator
from seg2eye_tpu.models.layers import at_least_f32
from seg2eye_tpu.ops import losses as L
from seg2eye_tpu.ops import metrics
from seg2eye_tpu.ops.image import one_hot_label
from seg2eye_tpu.options import Options

MUTABLE = ["spectral", "batch_stats"]


class Pix2Pix:
    """Holds the three module definitions + static config. Stateless."""

    def __init__(self, opt: Options):
        # the reference resolves these by reflection (networks/__init__.py:14)
        # but ships exactly one class per role; unknown names fail fast here
        assert opt.netG == "spadestyle", f"unknown netG '{opt.netG}'"
        assert opt.netD == "multiscale", f"unknown netD '{opt.netD}'"
        assert opt.netE == "conv", f"unknown netE '{opt.netE}'"
        assert opt.netD_subarch == "n_layer", opt.netD_subarch
        self.opt = opt
        # float64 is the VERIFICATION mode (requires JAX_ENABLE_X64): it
        # exists so the lockstep oracle can run our exact step semantics in
        # double precision against torch.double (check_lockstep_dynamics)
        self.dtype = {"bfloat16": jnp.bfloat16,
                      "float64": jnp.float64}.get(opt.compute_dtype,
                                                  jnp.float32)
        self.gen = SpadeStyleGenerator(
            ngf=opt.ngf, output_nc=opt.output_nc, semantic_nc=opt.semantic_nc,
            crop_size=opt.crop_size, aspect_ratio=opt.aspect_ratio,
            num_upsampling_layers=opt.num_upsampling_layers,
            norm_g=opt.norm_G, w_dim=opt.w_dim,
            init_type=opt.init_type, init_gain=opt.init_variance,
            remat=opt.remat)
        self.enc = ConvEncoder(ngf=opt.ngf, w_dim=opt.w_dim,
                               crop_size=opt.crop_size, norm_e=opt.norm_E,
                               init_type=opt.init_type,
                               init_gain=opt.init_variance)
        self.disc = MultiscaleDiscriminator(
            ndf=opt.ndf, n_layers=opt.n_layers_D, num_d=opt.num_D,
            norm_d=opt.norm_D,
            get_intermediate_features=not opt.no_ganFeat_loss,
            init_type=opt.init_type, init_gain=opt.init_variance)
        if not opt.no_vgg_loss:
            from seg2eye_tpu.models.vgg import VGG19Features
            self.vgg = VGG19Features()

    # ------------------------------------------------------------------ #
    # init
    # ------------------------------------------------------------------ #
    def init_variables(self, rng: jax.Array, with_disc: bool = True) -> Dict:
        # jitted as ONE program: eager per-op compiles are pathologically slow
        # on small hosts (~0.4s per op), one fused init compile is not.
        return jax.jit(self._init_variables,
                       static_argnums=(1,))(rng, with_disc)

    def _init_variables(self, rng: jax.Array, with_disc: bool = True) -> Dict:
        opt = self.opt
        h, w = opt.image_height, opt.image_width
        kg, ke, kd = jax.random.split(rng, 3)
        seg = jnp.zeros((1, h, w, opt.semantic_nc), self.dtype)
        wvec = jnp.zeros((1, opt.w_dim), jnp.float32)
        img = jnp.zeros((1, h, w, opt.input_nc), self.dtype)
        variables = {
            "G": self.gen.init(kg, seg, wvec),
            "E": self.enc.init(ke, img),
        }
        if with_disc:
            d_in = jnp.zeros((2, h, w, opt.semantic_nc + opt.output_nc),
                             self.dtype)
            variables["D"] = self.disc.init(kd, d_in)
        if with_disc and not opt.no_vgg_loss:
            # frozen perceptual net; real weights come from --vgg_weights
            # (utils/checkpoint.py load_vgg), random init only for tests
            variables["VGG"] = self.vgg.init(
                jax.random.fold_in(rng, 4), jnp.zeros((1, h, w, 3),
                                                      jnp.float32))
        return variables

    # ------------------------------------------------------------------ #
    # forward pieces
    # ------------------------------------------------------------------ #
    def preprocess(self, batch: Dict) -> Tuple[jax.Array, jax.Array,
                                               Optional[jax.Array]]:
        """one-hot the label map; cast to compute dtype
        (pix2pix_model.py:138-160).  uint8 images (opt.device_normalize
        transport) get the host Normalize(0.5,0.5) formula in-graph."""
        def norm(x):
            if x.dtype == jnp.uint8:
                x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            return x.astype(self.dtype)

        seg = one_hot_label(batch["label"], self.opt.semantic_nc).astype(self.dtype)
        style = norm(batch["style_image"])
        target = batch.get("target")
        if target is not None:
            target = norm(target)
        return seg, style, target

    def encode_w(self, variables: Dict, style: jax.Array, train: bool,
                 constrain=None) -> Tuple[jax.Array, List[jax.Array], Dict]:
        """style: (B,k,H,W,1) -> (w (B,w_dim), aggregated features, new E vars)."""
        b, k = style.shape[:2]
        if self.opt.per_sample_encode_enabled and b > 1:
            return self._encode_w_per_sample(variables, style, train,
                                             constrain)
        flat = style.reshape(b * k, *style.shape[2:])
        if train:
            (mu, logvar, feats), mut = self.enc.apply(
                variables["E"], flat, update_stats=True, mutable=MUTABLE)
            new_e = {**variables["E"], **mut}
        else:
            # reference parity: inference runs in torch train mode (the
            # Tester never calls .eval()), so a batch-subnorm encoder
            # (norm_E='spectralbatch') normalizes with batch stats unless
            # the user opts into running-stat eval
            # (opt.eval_use_running_stats, same switch generate() honors);
            # flax requires batch_stats mutability for the batch-stat
            # path — updates are discarded, mirroring generate().  No-op
            # for the default instance norm (empty collection).  Variant
            # caveat (PARITY.md "Batch-subnorm stats"): at B>1 the fused
            # (B*k) encode computes BN stats over all B*k refs while the
            # reference's per-sample loop uses each sample's own k.
            (mu, logvar, feats), _ = self.enc.apply(
                variables["E"], flat, update_stats=False,
                use_running_average=self.opt.eval_use_running_stats,
                constrain=constrain, mutable=["batch_stats"])
            new_e = variables["E"]
        mu = mu.reshape(b, k, -1)
        feats = [f.reshape(b, k, *f.shape[1:]) for f in feats]
        w = self._aggregate(mu, axis=1)
        feats = [self._aggregate(f, axis=1) for f in feats]
        return w, feats, new_e

    def _encode_w_per_sample(self, variables: Dict, style: jax.Array,
                             train: bool, constrain=None
                             ) -> Tuple[jax.Array, List[jax.Array], Dict]:
        """Reference-EXACT per-sample encoding (``--per_sample_encode``).

        The reference runs netE once per SAMPLE over its k style refs
        (pix2pix_model.py:285 ``self.netE(style_images[b])`` inside a Python
        loop, aggregation at :299-303), so

          * spectral-norm u power-iterates once per sample — sample b runs
            with a (b+1)-times-iterated u (torch's pre-hook fires per
            forward), and
          * a batch-subnorm encoder (norm_E='spectralbatch',
            normalization.py:15-47) computes BN batch statistics over each
            sample's OWN k refs and advances running stats B times per step.

        TPU-first shape: the loop becomes a ``lax.scan`` over the batch axis
        threading the mutable collections (spectral u/v, batch_stats) as the
        carry — one compiled program, sequential like the reference.  The
        fused default (encode_w) coincides with this at B=1 or at the
        spectral fixed point; this path removes the B>1 caveats entirely.
        """
        evars = variables["E"]
        mut0 = {c: evars[c] for c in MUTABLE if c in evars}
        static = {c: v for c, v in evars.items() if c not in mut0}
        ura = self.opt.eval_use_running_stats
        cs = constrain

        def step(carry, style_b):          # style_b: (k,H,W,1)
            if train:
                (mu, logvar, feats), mut = self.enc.apply(
                    {**static, **carry}, style_b, update_stats=True,
                    mutable=MUTABLE)
                carry = {c: mut.get(c, carry[c]) for c in carry}
            else:
                # same torch-train-mode batch-stat semantics as the fused
                # eval path, but per-sample: stats over this sample's own k
                # refs; updates discarded (mirrors generate())
                (mu, logvar, feats), _ = self.enc.apply(
                    {**static, **carry}, style_b, update_stats=False,
                    use_running_average=ura, constrain=cs,
                    mutable=["batch_stats"])
            return carry, (mu, logvar, tuple(feats))

        carry, (mu, logvar, feats) = jax.lax.scan(step, mut0, style)
        new_e = {**static, **carry} if train else evars
        # scan stacks per-sample outputs: mu (B,k,w_dim), feats (B,k,...)
        w = self._aggregate(mu, axis=1)
        feats = [self._aggregate(f, axis=1) for f in feats]
        return w, feats, new_e

    def _aggregate(self, t: jax.Array, axis: int) -> jax.Array:
        if self.opt.style_aggr_method == "mean":
            return jnp.mean(t, axis=axis)
        if self.opt.style_aggr_method == "max":
            return jnp.max(t, axis=axis)
        raise ValueError(self.opt.style_aggr_method)

    def generate(self, variables: Dict, seg: jax.Array, w: jax.Array,
                 train: bool, constrain=None) -> Tuple[jax.Array, Dict]:
        if train:
            fake, mut = self.gen.apply(
                variables["G"], seg, at_least_f32(w),
                update_stats=True, use_running_average=False, mutable=MUTABLE)
            return fake, {**variables["G"], **mut}
        ura = self.opt.eval_use_running_stats
        if ura:
            fake = self.gen.apply(variables["G"], seg, at_least_f32(w),
                                  update_stats=False, use_running_average=True,
                                  constrain=constrain)
        else:
            # reference parity: inference runs in torch train mode (the
            # Tester never calls .eval(), SURVEY §2 C12), i.e. batch stats.
            # flax requires mutability for that; updates are discarded.
            fake, _ = self.gen.apply(variables["G"], seg,
                                     at_least_f32(w),
                                     update_stats=False,
                                     use_running_average=False,
                                     mutable=["batch_stats"],
                                     constrain=constrain)
        return fake, variables["G"]

    def generate_fake(self, variables: Dict, seg: jax.Array, style: jax.Array,
                      train: bool):
        w, feats, new_e = self.encode_w(variables, style, train)
        fake, new_g = self.generate(variables, seg, w, train)
        return fake, w, feats, {"G": new_g, "E": new_e}

    def discriminate(self, variables: Dict, seg: jax.Array, fake: jax.Array,
                     real: jax.Array, train: bool,
                     interleave: Optional[bool] = None):
        """The reference runs fake+real as ONE 2B batch (pix2pix_model.py:
        328-342, divide_pred 344-358).  Two bitwise-equivalent layouts for
        that batch:

        * ``interleave=True`` — [f0,r0,f1,r1,...]: with the batch axis
          sharded over 'data' this is a LOCAL reshape on every device
          (major sharded axis x minor 2) and splits back via a (B,2,...)
          reshape + minor-axis index, so the multi-chip program has ZERO
          resharding collectives (the [all fake|all real] concat costs
          ~114 MB/step of collective-permute at the full config, and a
          strided-slice split backward lowers to scatter-adds that SPMD
          realizes as full-activation all-reduces).
        * ``interleave=False`` — [all fake | all real]: fuses marginally
          better single-chip (~2 ms/step at bs16 on v5e).

        Math is identical either way: per-sample ops are permutation-
        equivariant and any cross-batch statistic sees the same 2B samples
        (tests/test_networks.py::test_discriminate_layouts_identical).
        Default: interleaved exactly when multiple devices exist."""
        if interleave is None:
            interleave = jax.device_count() > 1
        fake_concat = jnp.concatenate([seg, fake], axis=-1)
        real_concat = jnp.concatenate([seg, real], axis=-1)
        half = fake.shape[0]
        if interleave:
            both = jnp.stack([fake_concat, real_concat], axis=1)
            both = both.reshape((2 * half,) + fake_concat.shape[1:])
        else:
            both = jnp.concatenate([fake_concat, real_concat], axis=0)
        if train:
            out, mut = self.disc.apply(variables["D"], both,
                                       update_stats=True, mutable=MUTABLE)
            new_d = {**variables["D"], **mut}
        else:
            # same torch-train-mode batch-stat semantics (and
            # eval_use_running_stats opt-out) as encode_w above for a
            # batch-subnorm D; updates discarded
            out, _ = self.disc.apply(
                variables["D"], both, update_stats=False,
                use_running_average=self.opt.eval_use_running_stats,
                mutable=["batch_stats"])
            new_d = variables["D"]

        def halves(t):
            if not interleave:
                return t[:half], t[half:]
            p = t.reshape((half, 2) + t.shape[1:])
            return p[:, 0], p[:, 1]

        split = [[halves(t) for t in scale] for scale in out]
        pred_fake = [[f for f, _ in scale] for scale in split]
        pred_real = [[r for _, r in scale] for scale in split]
        return pred_fake, pred_real, new_d

    # ------------------------------------------------------------------ #
    # losses
    # ------------------------------------------------------------------ #
    def generator_loss(self, variables: Dict, batch: Dict
                       ) -> Tuple[jax.Array, Tuple[Dict, jax.Array, Dict]]:
        """Returns (total_loss, (loss_dict, fake_image, new_variables))."""
        opt = self.opt
        seg, style, target = self.preprocess(batch)
        fake, w_real, feats_real, newv = self.generate_fake(
            variables, seg, style, train=True)
        pred_fake, pred_real, new_d = self.discriminate(
            {**variables}, seg, fake, target, train=True)
        newv["D"] = new_d

        losses: Dict[str, jax.Array] = {}
        raw: Dict[str, jax.Array] = {}
        losses["GAN"] = L.gan_loss(pred_fake, True, for_discriminator=False,
                                   mode=opt.gan_mode)
        if opt.lambda_l2:
            l2 = L.l2_loss(fake, target)
            losses["L2/weighted"] = l2 * opt.lambda_l2
            raw["L2/raw"] = l2
        if opt.lambda_l1:
            l1 = L.l1_loss(fake, target)
            losses["L1/weighted"] = l1 * opt.lambda_l1
            raw["L1/raw"] = l1
        if opt.lambda_openeds:
            eds = jnp.mean(metrics.mse_for_tensors(at_least_f32(fake),
                                                   at_least_f32(target)))
            losses["openeds/weighted"] = eds * opt.lambda_openeds
            raw["openeds/raw"] = eds

        if opt.lambda_style_feat or opt.lambda_style_w or opt.lambda_gram:
            w_fake, feats_fake, new_e2 = self.encode_w(
                {"E": newv["E"]}, fake[:, None], train=True)
            newv["E"] = new_e2
            if opt.lambda_style_w > 0:
                sw = L.l2_loss(w_fake, w_real)
                losses["style_w/weighted"] = sw * opt.lambda_style_w
                raw["style_w/raw"] = sw
            if opt.lambda_style_feat > 0:
                sf = L.multi_feature_mse(feats_fake, feats_real)
                losses["style_feat/weighted"] = sf * opt.lambda_style_feat
                raw["style_feat/raw"] = sf
            if opt.lambda_gram > 0:
                gl = L.multi_gram_loss(feats_fake, feats_real)
                losses["gram/weighted"] = gl * opt.lambda_gram
                raw["gram/raw"] = gl

        if not opt.no_ganFeat_loss:
            losses["GAN_Feat"] = L.feature_matching_loss(
                pred_fake, pred_real, opt.lambda_feat)

        if not opt.no_vgg_loss:
            # pix2pix_model.py:228-229 (SPADE semantics; the fork's class is
            # missing — see models/vgg.py).  fake+real run as ONE interleaved
            # 2B batch — a single VGG program, and the interleave keeps the
            # batch axis layout local under DP sharding (same trick as
            # discriminate()).
            from seg2eye_tpu.models.vgg import to_rgb
            pair = jnp.stack([to_rgb(fake), to_rgb(target)], axis=1)
            feats = self.vgg.apply(
                variables["VGG"],
                pair.reshape(-1, *pair.shape[2:]).astype(self.dtype))
            feats_f = [f.reshape(-1, 2, *f.shape[1:])[:, 0] for f in feats]
            feats_r = [f.reshape(-1, 2, *f.shape[1:])[:, 1] for f in feats]
            vl = L.vgg_loss(feats_f, feats_r)
            losses["VGG/weighted"] = vl * opt.lambda_vgg
            raw["VGG/raw"] = vl

        total = sum(jnp.mean(v) for v in losses.values())
        return total, ({**losses, **raw}, fake, newv)

    def discriminator_loss(self, variables: Dict, batch: Dict,
                           fake: Optional[jax.Array] = None
                           ) -> Tuple[jax.Array, Tuple[Dict, Dict]]:
        """If ``fake`` is None it is generated under stop-gradient
        (pix2pix_model.py:251-254)."""
        opt = self.opt
        seg, style, target = self.preprocess(batch)
        newv = dict(variables)
        if fake is None:
            fake, _, _, gen_new = self.generate_fake(variables, seg, style,
                                                     train=True)
            newv.update(gen_new)
        fake = jax.lax.stop_gradient(fake)
        pred_fake, pred_real, new_d = self.discriminate(
            variables, seg, fake, target, train=True)
        newv["D"] = new_d
        losses = {
            "D/Fake": L.gan_loss(pred_fake, False, for_discriminator=True,
                                 mode=opt.gan_mode),
            "D/real": L.gan_loss(pred_real, True, for_discriminator=True,
                                 mode=opt.gan_mode),
        }
        total = sum(jnp.mean(v) for v in losses.values())
        return total, (losses, newv)

    # ------------------------------------------------------------------ #
    # inference
    # ------------------------------------------------------------------ #
    def inference(self, variables: Dict, batch: Dict,
                  latent_style: Optional[jax.Array] = None,
                  constrain=None) -> jax.Array:
        """mode='inference' (pix2pix_model.py:79-88).  Passing
        ``latent_style`` mirrors the reference's data['latent_style'] path
        (generate_fake_from_stylecode).  ``constrain`` is the optional
        spatial-sharding activation policy for context-parallel serving
        (parallel.sharding.spatial_constraint)."""
        seg, style, _ = self.preprocess(batch)
        if latent_style is None:
            latent_style, _, _ = self.encode_w(variables, style, train=False,
                                               constrain=constrain)
        fake, _ = self.generate(variables, seg, latent_style, train=False,
                                constrain=constrain)
        return fake.astype(jnp.float32)

    def encode_only(self, variables: Dict, batch: Dict) -> jax.Array:
        """mode='encode_only' (pix2pix_model.py:77-79): style images -> w."""
        _, style, _ = self.preprocess(batch)
        w, _, _ = self.encode_w(variables, style, train=False)
        return w
