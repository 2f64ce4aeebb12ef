# Default runtime (counterpart of the reference configs/_base_/default_runtime.py)
weight = None  # path to checkpoint name to load
resume = False
seed = None
save_path = "exp/default"
num_devices = None  # None = all local devices
mix_prob = 0.0
empty_cache = False
enable_amp = True  # informational: compute dtype is set per-model via dtype
serialization_depth = 12
scenes_per_device = 2
feat_dim = 6

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=1),
]

train = dict(type="DefaultTrainer")
test = dict(type="SemSegTester", verbose=True)
