import json
from ctseg_tpu.data.datasets import PackedDataset3D
from ctseg_tpu.training.trainer import Trainer
from ctseg_tpu.inference.evaluate import evaluate_3d_sliding_window, format_table

test = PackedDataset3D.load('/tmp/tpu_run/storage/miccai_3d/test_packed.npz')
tr, state = Trainer.restore('/tmp/tpu_run/run_3d')  # volumetric_mode in ckpt... (saved before the field; default resize)
from ctseg_tpu.volumetric.trainer3d import _windowed_patch_transform
tr.train_transform = tr.test_transform = _windowed_patch_transform
res = evaluate_3d_sliding_window(tr, state.params, test, patch_size=(128,128,16),
                                 overlap=0.5, batch_size=8, with_hd95=True)
print(format_table(res), flush=True)
print('vols/min:', round(res['vols_per_min'], 2), flush=True)
json.dump(res, open('/tmp/tpu_run/eval_3d.json','w'), indent=2)
