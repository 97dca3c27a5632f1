"""Stage-by-stage device timing of the full-cloud extraction.

Breaks the fused extract into: chunked attention (ball-query+group+detector
over every point), NMS, and the descriptor pass, each timed as its own
executable with readback sync — to see which stage binds at 16k and 120k
points before optimizing (VERDICT r1 items 2/3/4).

    python benchmarks/profile_extract.py [--big]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true")
    p.add_argument("--n", type=int, default=0, help="synthetic cloud size override")
    args = p.parse_args()

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig, bucket_for
    from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops import ball_query, group_points, nms_keypoints
    from feat3dnet_tpu.utils import enable_compilation_cache
    from feat3dnet_tpu.utils.profiling import timed_device_call

    enable_compilation_cache()  # persistent .jax_cache — tunnel compiles are 30-400 s
    cfg = ModelConfig(num_clusters=-1)
    icfg = InferenceConfig()
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)), training=False)
    pipe = InferencePipeline(model, v, cfg, icfg)

    if args.big:
        rng = np.random.RandomState(0)
        cloud = np.concatenate([
            rng.rand(120000, 3).astype(np.float32) * np.array([100, 100, 10], np.float32),
            np.zeros((120000, 3), np.float32)], axis=1)
    else:
        cloud = load_point_cloud(example_cloud_path("oxford_270.bin"), 6)
    if args.n:
        rng = np.random.RandomState(0)
        cloud = np.concatenate([
            rng.rand(args.n, 3).astype(np.float32) * np.array([100, 100, 10], np.float32),
            np.zeros((args.n, 3), np.float32)], axis=1)

    n = cloud.shape[0]
    nb = bucket_for(n)
    padded = np.zeros((1, nb, 3), np.float32)
    padded[0, :n] = cloud[:, :3]
    valid = np.zeros((1, nb), bool)
    valid[0, :n] = True
    xyz = jnp.asarray(padded)
    valid_j = jnp.asarray(valid)
    print(f"cloud n={n} bucket={nb}", flush=True)

    # 1. full fused extract (includes host sort + CSR build + transfers on
    # the hashed path — i.e. the real per-cloud cost)
    if pipe._use_hashed():
        def fused_call():
            packed, s_att, s_nms = pipe._host_sort_packed(padded, valid)
            return pipe._extract_fn(nb, (s_att, s_nms))(pipe.variables, packed)
    else:
        def fused_call():
            return pipe._extract_fn(nb)(pipe.variables, xyz, valid_j)
    t = timed_device_call(fused_call)
    print(f"extract total:            {t * 1e3:8.1f} ms", flush=True)

    # 2. chunked attention alone
    att_fn = jax.jit(pipe._chunked_attention(nb))
    t = timed_device_call(lambda: att_fn(pipe.variables, xyz, valid_j))
    print(f"  attention pass:         {t * 1e3:8.1f} ms", flush=True)

    # 2a. ball query alone at attention-pass shape (chunk x bucket)
    chunk = pipe._chunk_size(nb)
    centers = xyz[:, :chunk]

    bq = jax.jit(lambda x, c: ball_query(x, c, cfg.base_scale, cfg.num_samples,
                                         valid_mask=valid_j))
    t = timed_device_call(lambda: bq(xyz, centers))
    n_chunks = nb // chunk
    print(f"  ball_query {chunk}x{nb}: {t * 1e3:8.1f} ms x{n_chunks} chunks = "
          f"{t * 1e3 * n_chunks:8.1f} ms", flush=True)

    # 2b. group+detector at same shape (everything in attention minus bq)
    def group_and_det(x, c):
        idx, cnt = ball_query(x, c, cfg.base_scale, cfg.num_samples,
                              valid_mask=valid_j)
        g = group_points(x, idx)
        return g.sum()

    t = timed_device_call(lambda: jax.jit(group_and_det)(xyz, centers))
    print(f"  bq+group:               {t * 1e3:8.1f} ms x{n_chunks}", flush=True)

    # 3. NMS alone
    att = jnp.abs(xyz[..., 0]) + 0.1
    nms = jax.jit(lambda x, a: nms_keypoints(x, a, icfg.nms_radius,
                                             icfg.max_keypoints,
                                             icfg.min_response_ratio,
                                             valid_mask=valid_j))
    t = timed_device_call(lambda: nms(xyz, att))
    print(f"  nms:                    {t * 1e3:8.1f} ms", flush=True)

    # 4. descriptor pass at 1024 keypoints
    kp = xyz[:, :icfg.max_keypoints]
    desc = pipe._describe_fn(nb, icfg.max_keypoints)
    t = timed_device_call(lambda: desc(pipe.variables, xyz, valid_j, kp))
    print(f"  descriptor pass:        {t * 1e3:8.1f} ms", flush=True)

    # 5. hashed-path stages (the TPU fast path inside the fused extract)
    if pipe._use_hashed():
        import time as _time

        from feat3dnet_tpu.ops.hash_grid import ball_max_csr

        t0 = _time.time()
        packed, s_att, s_nms = pipe._host_sort_packed(padded, valid)
        print(f"  host sort + CSR build:  {(_time.time() - t0) * 1e3:8.1f} ms"
              f"  (csr steps: att {s_att}, nms {s_nms})", flush=True)

        pts4, bbox, invp = pipe._host_sort(xyz, valid_j)
        core = jax.jit(pipe._hashed_attention_sorted(nb))
        t = timed_device_call(lambda: core(pipe.variables, pts4, bbox))
        print(f"  hashed attention (dense grid): {t * 1e3:8.1f} ms", flush=True)

        att_s = core(pipe.variables, pts4, bbox)[0]
        if s_nms:
            o = pipe.packed_offsets(nb, s_att)[2]
            t_nms = jnp.asarray(packed[o:o + s_nms].astype(np.int32))
            b_nms = jnp.asarray(packed[o + s_nms:o + 2 * s_nms].astype(np.int32))
            bm = jax.jit(lambda p, a, ti, bi: ball_max_csr(
                p, a, ti, bi, float(icfg.nms_radius),
                block_size=pipe._HASH_BLOCK, tile=pipe._HASH_TILE))
            t = timed_device_call(lambda: bm(pts4, att_s, t_nms, b_nms))
            print(f"  hashed nms ball-max (CSR): {t * 1e3:8.1f} ms", flush=True)
        else:
            from feat3dnet_tpu.ops.hash_grid import ball_max_sorted

            bm = jax.jit(lambda p, b, a: ball_max_sorted(
                p, b, a, float(icfg.nms_radius)))
            t = timed_device_call(lambda: bm(pts4, bbox, att_s))
            print(f"  hashed nms ball-max:    {t * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
