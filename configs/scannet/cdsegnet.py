# CDSegNet (CNF dual-branch PTv3) on ScanNet 20-class.
# Hyperparameters match the reference recipe (configs/scannet/CDSegNet.py):
# 800 data epochs as 100 eval-epochs x loop 8, AdamW lr 2e-3 (blocks 2e-4),
# wd 0.05, OneCycle pct_start 0.5, seed 54421566, Mix3D 0.8, GLS loss,
# T=1000 cosine schedule.
_base_ = ["../_base_/default_runtime.py"]

# ---- common ----
scenes_per_device = 2  # bs2 per chip; DP over chips scales global batch
num_points_per_scene = 102400
bucket_num_points = scenes_per_device * num_points_per_scene
# microbatch=2 trains each scene as its own 102,400-pt accumulation slice
# (unrolled no-remat fits HBM per slice: ~74k pts/s vs ~60k whole-bucket
# remat) — set it together with remat_blocks=False below. Default 1 keeps
# cross-scene Mix3D exactly as the reference recipe.
microbatch = 1
mix_prob = 0.8
seed = 54421566
gredient_clip = []
ignore_index = -1
save_freq_threshold = 70  # cheap per-epoch snapshots after this epoch

# ---- diffusion ----
condition = True
dm = True
dm_input = "xt"
dm_target = "noise"
dm_min_snr = None
T = 1000
T_dim = 128
beta_start = 0
beta_end = 1000
noise_schedule = "cosine"
c_in_channels = 6

loss_type = "GLS"
task_num = 2
num_classes = 20

model = dict(
    type="DefaultSegmentorV2",
    backbone=dict(
        type="PT-v3m1",
        c_in_channels=c_in_channels,
        n_in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        c_stride=(4, 4),
        c_enc_depths=(2, 2, 2),
        c_enc_channels=(32, 64, 128),
        c_enc_num_head=(2, 4, 8),
        c_enc_patch_size=(1024, 1024, 1024),
        c_dec_depths=(2, 2),
        c_dec_channels=(64, 64),
        c_dec_num_head=(4, 4),
        c_dec_patch_size=(1024, 1024),
        n_stride=(2, 2, 2, 2),
        n_enc_depths=(2, 2, 2, 6, 6),
        n_enc_channels=(32, 64, 128, 256, 512),
        n_enc_num_head=(2, 4, 8, 16, 32),
        n_enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        n_dec_depths=(2, 2, 2, 2),
        n_dec_channels=(64, 64, 128, 256),
        n_dec_num_head=(4, 4, 8, 16),
        n_dec_patch_size=(1024, 1024, 1024, 1024),
        mlp_ratio=4,
        qkv_bias=True,
        drop_path=0.3,
        shuffle_orders=True,
        upcast_softmax=False,
        num_classes=num_classes,
        T_dim=T_dim,
        condition=condition,
        tm_bidirectional=False,
        tm_feat=1.0,
        skip_connection_mode="cat",
        skip_connection_scale=True,
        capacity_div=(1, 2, 4, 16, 64),
        dtype="bfloat16",
        # train layout: UNROLLED block stacks (lax.scan residual stacks are
        # invisible to XLA's rematerializer — measured +7 GB temp at the
        # 104k bucket, DESIGN §13). Serving restacks the checkpoint to the
        # fast-compiling scanned layout (tools/test.py, serve_scan_blocks).
        scan_blocks=False,
        # fused dual-branch gathers: +2.8% train step (76.7k vs 74.6k pts/s
        # @104k, DESIGN §14); tools/test.py converts checkpoints to the
        # unfused SERVING layout automatically (fused serving is slower)
        fuse_dual_gathers=True,
        # the whole 204,800-pt device bucket does not fit unrolled-no-remat
        # (~22 GB temp); dots_saveable remat keeps matmul outputs resident
        # and fits. For ~25% more train throughput set microbatch=2 below
        # (2 x 102,400 accumulation, remat off) — the documented tradeoff is
        # that Mix3D merges only within a micro bucket, i.e. not at 1
        # scene/micro.
        remat_blocks=True,
        remat_policy="dots_saveable",
    ),
    criteria=[
        dict(type="MSELoss", loss_weight=1.0, ignore_index=ignore_index),
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=ignore_index),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=ignore_index),
    ],
    loss_type=loss_type,
    task_num=task_num,
    num_classes=num_classes,
    T=T,
    beta_start=beta_start,
    beta_end=beta_end,
    noise_schedule=noise_schedule,
    T_dim=T_dim,
    dm=dm,
    dm_input=dm_input,
    dm_target=dm_target,
    dm_min_snr=dm_min_snr,
    condition=condition,
    c_in_channels=c_in_channels,
)

epoch = 800
eval_epoch = 100  # 800 data epochs = 100 eval epochs x loop 8

optimizer = dict(type="AdamW", lr=0.002, weight_decay=0.05)
scheduler = dict(
    type="OneCycleLR",
    pct_start=0.50,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0002)]

dataset_type = "ScanNetDataset"
data_root = "data/scannet"

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="SphereCrop", point_max=num_points_per_scene, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("color", "normal")),
]

_val_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("color", "normal")),
]

_aug_rotations = [
    [dict(type="RandomRotateTargetAngle", angle=[a], axis="z",
          center=[0, 0, 0], p=1)] + extra
    for extra in ([], [dict(type="RandomScale", scale=[0.95, 0.95])],
                  [dict(type="RandomScale", scale=[1.05, 1.05])])
    for a in (0, 1 / 2, 1, 3 / 2)
] + [[dict(type="RandomFlip", p=1)]]

data = dict(
    num_classes=num_classes,
    ignore_index=ignore_index,
    names=[
        "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
        "window", "bookshelf", "picture", "counter", "desk", "curtain",
        "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
        "otherfurniture",
    ],
    train=dict(
        type=dataset_type,
        split="train",
        data_root=data_root,
        transform=_train_transform,
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="val",
        data_root=data_root,
        transform=_val_transform,
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="val",
        data_root=data_root,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="NormalizeColor"),
        ],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                          mode="test", keys=("coord", "color", "normal"),
                          return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="Collect", keys=("coord", "grid_coord", "index"),
                     feat_keys=("color", "normal")),
            ],
            aug_transform=_aug_rotations,
        ),
    ),
)
