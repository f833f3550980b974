import json, time
import jax, numpy as np
from ctseg_tpu.data.datasets import PackedDataset3D
from ctseg_tpu.volumetric.pipeline3d import PatchPipeline3D
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d
from ctseg_tpu.training.trainer import TrainConfig
from ctseg_tpu.inference.evaluate import evaluate_3d_sliding_window, format_table

train = PackedDataset3D.load('/tmp/tpu_run/storage/miccai_3d/train_packed.npz')
test = PackedDataset3D.load('/tmp/tpu_run/storage/miccai_3d/test_packed.npz')
PATCH = (128, 128, 16)
cfg = TrainConfig(filters=(32,64,128,256,512), num_res_units=2, batch_size=8,
                  loss_fx=("Focal","Dice"), exclude_missing=True, lr=1e-3,
                  spatial_dims=3, input_shape=PATCH, in_channels=1,
                  compute_dtype="bfloat16")
tr = make_trainer_3d(cfg, mode="patch")
pipe = PatchPipeline3D(train, batch_size=8, patch_size=PATCH)
state = tr.init_state()
key = jax.random.key(0)
t0 = time.time()
losses = []
for step, batch in enumerate(pipe.epoch(key, steps=400)):
    state, m = tr._train_step(state, batch, key)
    if step % 100 == 99:
        losses.append(round(float(m['loss/total']), 4))
        print('step', step+1, 'loss', losses[-1], 'dice', round(float(m['dice/mean']),3), flush=True)
train_time = time.time() - t0
print('400 patch steps in %.0fs' % train_time, flush=True)

res = evaluate_3d_sliding_window(tr, state.params, test, patch_size=PATCH,
                                 overlap=0.5, batch_size=8, with_hd95=True)
print(format_table(res), flush=True)
print('vols/min:', round(res['vols_per_min'], 2), flush=True)
json.dump({"patch_train_loss": losses, "train_seconds_400_steps": round(train_time,1),
           "sliding_window_eval": res}, open('/tmp/tpu_run/eval_3d.json','w'), indent=2)
