"""On-box scaling ceiling control: N independent processes, no Ray,
each looping the scorer's dominant matmul kernel; prints per-worker
iteration rate. Efficiency = rate32/rate8 (per-worker)."""
import multiprocessing as mp, time, numpy as np, sys

def worker(q, secs=8.0):
    a = np.random.rand(512, 60).astype(np.float32)
    w = np.random.rand(180, 60).astype(np.float32)
    n = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        (a @ w.T); n += 1
    q.put(n / (time.time() - t0))

def run(nw):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(nw)]
    [p.start() for p in ps]
    rates = [q.get() for _ in ps]
    [p.join() for p in ps]
    return sum(rates) / len(rates)

if __name__ == "__main__":
    r8 = run(8); r32 = run(32)
    print(f"per-worker iter/s: 8w={r8:.0f} 32w={r32:.0f} on-box ceiling={(r32/r8):.2f}")
