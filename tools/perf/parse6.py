"""Sharper XLA op breakdown: marker-based step count, careful categories."""
import sys, glob, collections, re
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sorted(glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            if name.startswith("%copy-start") or name.startswith("%copy-done"):
                continue
            agg[name] += ev.duration_ps / 1e9
            cnt[name] += 1
    # marker: the while loop (CLAHE scan) appears once per step
    marker = [n for n in cnt if n.startswith("%while")]
    nsteps = max((cnt[m] for m in marker), default=3)
    print(f"captured steps (by %while count): {nsteps}")
    cat = collections.Counter()
    def categorize(name):
        head = name.split(" = ")[0]
        rest = name.split(" = ", 1)[1] if " = " in name else ""
        if head.startswith("%while"): return "while(CLAHE-scan)"
        if head.startswith("%convert_reduce"): return "BN-stats reduce"
        if head.startswith("%convolution") or head.startswith("%conv"): return "conv"
        if head.startswith("%select-and-scatter"): return "maxpool-bwd"
        if head.startswith("%broadcast"): return "broadcast(upsample)"
        if head.startswith("%reduce"): return "reduce"
        if head.startswith("%custom-call"): return "custom-call(pallas)"
        if head.startswith("%fusion"):
            # kernel-gradient convs produce (3,3,Cin,Cout) f32 tuples
            if re.match(r"\(f32\[3,3,", rest) or re.match(r"\(f32\[7,7,", rest) or re.match(r"\(f32\[1,1,", rest):
                return "conv(kernel-grad)"
            if re.match(r"bf16\[\d+,128\]", rest) or "gather" in name:
                return "gather(warp)"
            return "fusion(elementwise)"
        if head.startswith("%all-reduce"): return "all-reduce"
        if head.startswith("%dynamic"): return "dynamic-slice/update"
        if head.startswith("%transpose") or head.startswith("%copy"): return "layout-copy"
        if head.startswith("%dot"): return "dot"
        return "other:" + head.split(".")[0]
    for name, d in agg.items():
        cat[categorize(name)] += d
    total = sum(agg.values())
    print(f"== {plane.name}: compute total {total/nsteps:.1f} ms/step")
    for k, v in cat.most_common(18):
        print(f"  {v/nsteps:8.2f} ms/step  {k}")
    print("-- top 30 individual (ms/step):")
    for name, ms in agg.most_common(30):
        print(f"  {ms/nsteps:7.2f}  {name[:130]}")
