"""Wire/step accounting for the fused AllReduce+RMSNorm paths.

Real ICI latency cannot be measured on a single chip, but the schedules
are fully deterministic, so the quantities that decide latency CAN be
accounted exactly from the kernel structure (collective_kernels.py):
bytes on the wire per chip, number of remote DMAs, network hops on the
critical path, and how many arrivals gate the first reduction add
(progressive vs wait-all). The wait-all column is what a
psum-then-norm XLA pipeline (or a barrier-style kernel) pays; the
progressive column is the Lamport-analog structure, validated for
correctness under a 4000-step arrival skew in
tests/test_collective_kernels.py.

Emits a markdown table (stdout) for BENCHMARKS.md.
"""

BF16 = 2


def rows(ws, n, h):
    msg = n * h * BF16
    chunk_rows = -(-n // ws)
    chunk = chunk_rows * h * BF16
    out = []
    # one_shot: every chip pushes its whole slab to ws-1 peers; reduce
    # consumes slabs progressively in absolute order.
    out.append(dict(
        variant="pallas one_shot", hops=1,
        bytes_per_chip=(ws - 1) * msg,
        remote_dmas=ws - 1,
        arrivals_before_first_add=1,   # slab 0 alone gates the first add
        arrivals_wait_all=ws - 1,
    ))
    # two_shot: reduce-scatter (ws-1 chunk sends) + fused norm on the
    # owned chunk + all-gather of out AND out_res (2 buffers).
    out.append(dict(
        variant="pallas two_shot", hops=2,
        bytes_per_chip=(ws - 1) * chunk + 2 * (ws - 1) * chunk,
        remote_dmas=(ws - 1) + 2 * (ws - 1),
        arrivals_before_first_add=1,
        arrivals_wait_all=ws - 1,
    ))
    # XLA baseline: psum (ring reduce-scatter + all-gather) then a
    # SEPARATE norm pass that round-trips x through HBM; out_res rides
    # the same all-reduced tensor so only one buffer moves.
    out.append(dict(
        variant="xla psum + norm", hops=2 * (ws - 1),  # ring steps
        bytes_per_chip=2 * (ws - 1) * chunk,
        remote_dmas=2 * (ws - 1),
        arrivals_before_first_add=1,  # ring adds are also progressive
        arrivals_wait_all=ws - 1,
        note="+2 HBM round-trips of [N,H] for the unfused norm",
    ))
    return out


def main():
    ws = 8
    print("| tokens | hidden | variant | wire bytes/chip | remote DMAs |"
          " critical-path hops | arrivals gating 1st add (prog / wait-all) |")
    print("|---|---|---|---|---|---|---|")
    for n in (8, 128, 4096):
        for h in (4096, 5120, 7168):
            for r in rows(ws, n, h):
                mb = r["bytes_per_chip"] / 1e6
                print(f"| {n} | {h} | {r['variant']} | {mb:.2f} MB |"
                      f" {r['remote_dmas']} | {r['hops']} |"
                      f" {r['arrivals_before_first_add']} /"
                      f" {r['arrivals_wait_all']} |")


if __name__ == "__main__":
    main()
