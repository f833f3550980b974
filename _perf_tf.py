import time
import jax, jax.numpy as jnp, numpy as np
from ctseg_tpu.transforms.pipelines import batched_transform, get_transform
B, RAW = 128, 280
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(40,300,size=(B,RAW,RAW)).astype(np.float32))
labs = jnp.asarray(rng.integers(0,10,size=(B,RAW,RAW)).astype(np.int32))
key = jax.random.key(1)
for name, deg, train in [("deg2_train",2,True), ("deg1_test",1,False)]:
    tf = get_transform(deg, train=train)
    f = jax.jit(lambda k, im, lb, tf=tf: batched_transform(tf, k, im, lb))
    for _ in range(2): o = f(key, imgs, labs)
    float(o[0][0,0,0,0])
    t0 = time.perf_counter()
    for _ in range(10): o = f(key, imgs, labs)
    float(o[0][0,0,0,0])
    print(name, round((time.perf_counter()-t0)/10*1000,1), "ms", flush=True)

# squash_predictions + dice-metric + exclude-missing combo (the logging tail)
from ctseg_tpu.metrics import DiceMetric
from ctseg_tpu.ops import squash_predictions
logits = jnp.asarray(rng.normal(size=(B,256,256,10)).astype(np.float32))
labs2 = jnp.asarray(rng.integers(0,10,size=(B,256,256)).astype(np.int32))
ind = jnp.asarray(rng.integers(0,2,size=(B,9)).astype(np.float32))
dice = DiceMetric()
def tail():
    pl = jnp.concatenate([logits[..., :1], logits[..., 1:]*ind[:,None,None,:]], axis=-1)
    preds = squash_predictions(pl)
    return dice(preds, labs2)
f = jax.jit(tail)
for _ in range(2): o = f()
float(o[0])
t0 = time.perf_counter()
for _ in range(10): o = f()
float(o[0])
print("metric_tail", round((time.perf_counter()-t0)/10*1000,1), "ms", flush=True)
