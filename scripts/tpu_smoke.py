"""TPU kernel smoke test: compile + run every production kernel shape
class ON REAL HARDWARE and assert bitwise equality against the jnp
reference path.

Interpret mode (used by the CPU test suite) does not enforce Mosaic's
lowering constraints — a (1, L) reduction-output block passed every CPU
test and failed on the chip (see haar_pallas fused-extrema comment) — so
this script is the fast hardware regression check to run after any kernel
change: ~1 min with a warm compilation cache.

Exit code 0 = all kernels lower, run, and match bitwise.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavelet_tpu.runtime import debug  # noqa: E402

debug.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavelet_tpu.core import haar  # noqa: E402
from wavelet_tpu.kernels import haar_pallas as hp  # noqa: E402


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}  {name}", flush=True)
    return ok


def main():
    if jax.devices()[0].platform != "tpu":
        print("not a TPU — nothing to smoke-test")
        return 0
    rng = np.random.default_rng(0)
    failures = 0

    # shape classes the pipelines produce: cube boxes (packed), fixture
    # shapes (16x32x64 lane-packed, 8x4x2 heavily packed), odd dims (plain)
    cases = [
        ("cube64", (64, 64, 64), 16),
        ("fixture16x32x64", (16, 32, 64), 4),
        ("tiny8x4x2", (8, 4, 2), 8),
        # large AMR boxes (round-3: the whole-box gate is lifted for the
        # interleaved stencils; only those run here — the halves kernels
        # stream whole boxes and stay VMEM-bounded at 4 MiB)
        ("cube128", (128, 128, 128), 4),
        ("cube256", (256, 256, 256), 2),
    ]
    for name, dims, n in cases:
        x, y, z = dims
        boxes = rng.standard_normal((n,) + dims).astype(np.float32)
        ref_c = np.asarray(haar.haar3d_forward(jnp.asarray(boxes)))
        ref_r = np.asarray(haar.haar3d_inverse(jnp.asarray(ref_c)))
        flat = ref_c.reshape(n, -1)

        halves_ok = int(np.prod(dims)) * 4 <= (4 << 20)
        # halves kernels (plain + packed) — whole-box VMEM bound
        if halves_ok:
            try:
                c, mx, mn = hp.fused_forward(jnp.asarray(boxes))
                ok = (np.array_equal(np.asarray(c).view(np.int32),
                                     ref_c.view(np.int32))
                      and np.array_equal(np.asarray(mx), flat.max(axis=1))
                      and np.array_equal(np.asarray(mn), flat.min(axis=1)))
                out = np.asarray(hp.fused_inverse(c))
                ok = ok and np.array_equal(out.view(np.int32),
                                           ref_r.view(np.int32))
            except Exception as e:  # noqa: BLE001
                print(f"  halves/{name}: {e}")
                ok = False
            failures += not check(f"halves {name}", ok)

        from wavelet_tpu.runtime.batching import cap_pack

        P = cap_pack(hp.lane_pack_factor(dims), n, z)
        while P > 1 and n % P:
            P //= 2
        if P > 1 and halves_ok:
            packed = np.ascontiguousarray(
                boxes.reshape(n // P, P, x, y, z).transpose(0, 2, 3, 1, 4)
                .reshape(n // P, x, y, P * z))
            try:
                c, mx, mn = hp.fused_forward_packed(jnp.asarray(packed), P)
                c = np.asarray(c)
                ok = True
                for i in range(n):
                    m, p = divmod(i, P)
                    got = c[m, :, :, p * z:(p + 1) * z]
                    ok = ok and np.array_equal(got.view(np.int32),
                                               ref_c[i].view(np.int32))
                ok = ok and np.array_equal(np.asarray(mx), flat.max(axis=1))
                out = np.asarray(hp.fused_inverse_packed(jnp.asarray(c).astype(np.float32), P))
                for i in range(n):
                    m, p = divmod(i, P)
                    ok = ok and np.array_equal(
                        out[m, :, :, p * z:(p + 1) * z].view(np.int32),
                        ref_r[i].view(np.int32))
            except Exception as e:  # noqa: BLE001
                print(f"  packed/{name}: {e}")
                ok = False
            failures += not check(f"packed P={P} {name}", ok)

        IP = cap_pack(hp.interleaved_pack_factor(dims), n, z)
        while IP > 1 and n % IP:
            IP //= 2
        if hp.interleaved_ok(dims):
            packed = np.ascontiguousarray(
                boxes.reshape(n // IP, IP, x, y, z).transpose(0, 2, 3, 1, 4)
                .reshape(n // IP, x, y, IP * z))
            try:
                c, mx, mn = hp.fused_forward_interleaved(
                    jnp.asarray(packed), IP)
                c = np.asarray(c)
                px, py, pz = (hp.interleave_perm(v) for v in dims)
                ok = True
                for i in range(min(n, 3)):
                    m, p = divmod(i, IP)
                    phys = c[m, :, :, p * z:(p + 1) * z]
                    ok = ok and np.array_equal(
                        phys[np.ix_(px, py, pz)].view(np.int32),
                        ref_c[i].view(np.int32))
                ok = ok and np.array_equal(np.asarray(mx), flat.max(axis=1))
                out = np.asarray(hp.fused_inverse_interleaved(jnp.asarray(c)))
                for i in range(min(n, 3)):
                    m, p = divmod(i, IP)
                    ok = ok and np.array_equal(
                        out[m, :, :, p * z:(p + 1) * z].view(np.int32),
                        ref_r[i].view(np.int32))
            except Exception as e:  # noqa: BLE001
                print(f"  interleaved/{name}: {e}")
                ok = False
            failures += not check(f"interleaved P={IP} {name}", ok)

    # multi-scale + reduction-free interleaved variants
    dims, n, S = (16, 16, 16), 8, 2
    x, y, z = dims
    boxes = rng.standard_normal((n,) + dims).astype(np.float32)
    IP = hp.interleaved_pack_factor(dims)
    IP = min(IP, n)
    packed = np.ascontiguousarray(
        boxes.reshape(n // IP, IP, x, y, z).transpose(0, 2, 3, 1, 4)
        .reshape(n // IP, x, y, IP * z))
    try:
        ref = np.asarray(haar.haar3d_forward_multi(jnp.asarray(boxes), S))
        c, mx, mn = hp.fused_forward_interleaved(jnp.asarray(packed), IP, S)
        c = np.asarray(c)
        L = IP * z
        fmap = np.asarray(hp.interleave_map_multi(dims, S, y * L, L, 1))
        ok = True
        for i in range(min(n, 2)):
            m, p = divmod(i, IP)
            base = m * (x * y * L) + p * z
            got = c.reshape(-1)[base + fmap].reshape(dims)
            ok = ok and np.array_equal(got.view(np.int32),
                                       ref[i].view(np.int32))
        out = np.asarray(hp.fused_inverse_interleaved(jnp.asarray(c), IP, S))
        ref_out = np.asarray(haar.haar3d_inverse_multi(jnp.asarray(ref), S))
        for i in range(min(n, 2)):
            m, p = divmod(i, IP)
            ok = ok and np.array_equal(
                out[m, :, :, p * z:(p + 1) * z].view(np.int32),
                ref_out[i].view(np.int32))
    except Exception as e:  # noqa: BLE001
        print(f"  multiscale: {e}")
        ok = False
    failures += not check(f"interleaved multiscale S={S} P={IP}", ok)

    try:
        c2 = np.asarray(hp.fused_forward_interleaved_nored(
            jnp.asarray(packed), 1))
        c1, _, _ = hp.fused_forward_interleaved(jnp.asarray(packed), IP, 1)
        ok = np.array_equal(c2.view(np.int32), np.asarray(c1).view(np.int32))
    except Exception as e:  # noqa: BLE001
        print(f"  nored: {e}")
        ok = False
    failures += not check("interleaved nored", ok)

    print(f"{'ALL PASS' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
