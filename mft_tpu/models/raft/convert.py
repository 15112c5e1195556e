"""Convert reference PyTorch RAFT-OU checkpoints into flax variables.

The reference ships checkpoints saved through a DataParallel wrapper, so keys
are ``module.``-prefixed (MFT/raft.py:20-23); we strip that. Conv weights are
OIHW in torch and HWIO in flax. BatchNorm affine params land in 'params'
(scale/bias) and running stats in 'batch_stats' (mean/var); InstanceNorm has
no parameters in either framework (affine=False).

Layer-name mapping (torch -> flax), see layers.py/update.py for the modules:
  fnet.layer2.0.conv1        -> fnet/layer2_0/conv1
  fnet.layer2.0.downsample.0 -> fnet/layer2_0/downsample_conv
  cnet.<block>.norm1         -> cnet/<block>/BatchNorm_0   (norm2 -> _1, norm3 -> _2)
  update_block.mask.0 / .2   -> update_block/mask_conv1 / mask_conv2
  occlusion_block.<head>.model.{0,2,4,6} -> <head>/conv{0..3}   ('morelayers')
"""

import re

import numpy as np


def _to_numpy(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _conv_kernel(w):
    """OIHW -> HWIO."""
    return np.transpose(_to_numpy(w), (2, 3, 1, 0))


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_statedict_to_variables(state_dict, norm_fns=None):
    """Convert a torch RAFT state dict into flax {'params', 'batch_stats'}.

    args:
      state_dict: mapping of torch parameter names to tensors/arrays.
      norm_fns: {'fnet': 'instance', 'cnet': 'batch'} — which encoder uses
        which norm (defaults match the big model, reference raft.py:62-63).
    """
    norm_fns = norm_fns or {"fnet": "instance", "cnet": "batch"}
    params: dict = {}
    batch_stats: dict = {}

    def norm_index(name):
        # torch norm1/norm2 inside a block -> flax BatchNorm_{0,1}; the
        # downsample norm (torch `downsample.1`) is created third -> _2
        return {"norm1": 0, "norm2": 1, "downsample.1": 2}[name]

    for key, value in state_dict.items():
        key = re.sub(r"^module\.", "", key)
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]  # weight / bias / running_mean / running_var

        # --- encoders ------------------------------------------------------
        m = re.match(
            r"^(fnet|cnet)\.(conv1|conv2|norm1|layer(\d)\.(\d)\.(.+?))\.(weight|bias|running_mean|running_var)$",
            key)
        if m:
            enc = m.group(1)
            norm_fn = norm_fns[enc]
            if m.group(2) in ("conv1", "conv2"):
                path = [enc, m.group(2)]
                _emit_conv(params, path, leaf, value)
            elif m.group(2) == "norm1":  # stem norm
                _emit_norm(params, batch_stats, [enc, "BatchNorm_0" if norm_fn == "batch" else "GroupNorm_0"],
                           leaf, value, norm_fn)
            else:
                block = f"layer{m.group(3)}_{m.group(4)}"
                sub = m.group(5)
                if sub in ("conv1", "conv2", "conv3"):
                    _emit_conv(params, [enc, block, sub], leaf, value)
                elif sub == "downsample.0":
                    _emit_conv(params, [enc, block, "downsample_conv"], leaf, value)
                elif sub in ("norm1", "norm2", "downsample.1"):
                    if norm_fn == "batch":
                        nname = f"BatchNorm_{norm_index(sub)}"
                    elif norm_fn == "group":
                        nname = f"GroupNorm_{norm_index(sub)}"
                    else:
                        continue  # instance/none: no params
                    _emit_norm(params, batch_stats, [enc, block, nname],
                               leaf, value, norm_fn)
                elif sub in ("norm3",):  # unused naming variant
                    continue
                else:
                    raise KeyError(f"unmapped encoder sub-layer: {key}")
            continue

        # --- update block ----------------------------------------------------
        m = re.match(r"^update_block\.(encoder|gru|flow_head)\.(\w+)\.(weight|bias)$", key)
        if m:
            _emit_conv(params, ["update_block", m.group(1), m.group(2)], leaf, value)
            continue
        m = re.match(r"^update_block\.mask\.(0|2)\.(weight|bias)$", key)
        if m:
            name = "mask_conv1" if m.group(1) == "0" else "mask_conv2"
            _emit_conv(params, ["update_block", name], leaf, value)
            continue

        # --- OU block --------------------------------------------------------
        m = re.match(r"^occlusion_block\.(occl_head|uncertainty_head)\.(conv1|conv2)\.(weight|bias)$", key)
        if m:
            _emit_conv(params, ["occlusion_block", m.group(1), m.group(2)], leaf, value)
            continue
        m = re.match(r"^occlusion_block\.(occl_head|uncertainty_head)\.model\.(\d)\.(weight|bias)$", key)
        if m:
            conv_i = int(m.group(2)) // 2
            _emit_conv(params, ["occlusion_block", m.group(1), f"conv{conv_i}"],
                       leaf, value)
            continue

        raise KeyError(f"unmapped torch parameter: {key}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _emit_conv(params, path, leaf, value):
    if leaf == "weight":
        _set(params, path + ["kernel"], _conv_kernel(value))
    elif leaf == "bias":
        _set(params, path + ["bias"], _to_numpy(value))
    else:
        raise KeyError(f"conv leaf {leaf}")


def _emit_norm(params, batch_stats, path, leaf, value, norm_fn):
    v = _to_numpy(value)
    if leaf == "weight":
        _set(params, path + ["scale"], v)
    elif leaf == "bias":
        _set(params, path + ["bias"], v)
    elif leaf == "running_mean":
        _set(batch_stats, path + ["mean"], v)
    elif leaf == "running_var":
        _set(batch_stats, path + ["var"], v)
    else:
        raise KeyError(f"norm leaf {leaf}")


def variables_to_torch_statedict(variables, template_state_dict,
                                 norm_fns=None):
    """Inverse conversion: flax variables -> torch state dict values.

    ``template_state_dict`` supplies the torch key set and shapes (e.g. the
    state dict of a freshly constructed reference model, or any reference
    .pth). The mapping torch-key -> flax-path is DERIVED from the forward
    converter itself: each template tensor is replaced by an array filled
    with its key's ordinal, run through ``torch_statedict_to_variables``
    (constant arrays are invariant under the kernel transpose), and the
    resulting leaves are read back — so the two directions can never drift
    apart. Used to hand trained flax weights to the reference torch
    pipeline (tools/tapvid_parity.py with --model).
    """
    ids_keys = []
    tagged = {}
    for k, v in template_state_dict.items():
        kk = re.sub(r"^module\.", "", k)
        if kk.endswith("num_batches_tracked"):
            continue
        tagged[k] = np.full(np.shape(_to_numpy(v)), float(len(ids_keys)),
                            np.float64)
        ids_keys.append(k)
    mapped = torch_statedict_to_variables(tagged, norm_fns=norm_fns)

    loc = {}

    def walk(tree, col, path):
        for name, node in tree.items():
            if isinstance(node, dict):
                walk(node, col, path + [name])
            else:
                loc[ids_keys[int(np.asarray(node).flat[0])]] = (
                    col, path + [name])

    walk(mapped["params"], "params", [])
    if "batch_stats" in mapped:
        walk(mapped["batch_stats"], "batch_stats", [])

    out = {}
    for k, v in template_state_dict.items():
        kk = re.sub(r"^module\.", "", k)
        if kk.endswith("num_batches_tracked"):
            out[k] = _to_numpy(v)
            continue
        if k not in loc and ".norm3." in k:
            # torch registers the downsample norm twice (self.norm3 AND
            # downsample[1] are the same module); the forward converter
            # reads the downsample.1 copy. Stride-1 blocks carry an UNUSED
            # norm3 — keep its template value (never read by the forward).
            alias = k.replace(".norm3.", ".downsample.1.")
            if alias in loc:
                loc[k] = loc[alias]
            else:
                out[k] = _to_numpy(v)
                continue
        col, path = loc[k]
        node = variables[col]
        for p in path:
            node = node[p]
        arr = np.asarray(node)
        if path[-1] == "kernel" and arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        if arr.shape != tuple(np.shape(_to_numpy(v))):
            raise ValueError(f"shape mismatch for {k}: flax {arr.shape} "
                             f"vs template {np.shape(_to_numpy(v))}")
        out[k] = arr
    return out


def export_torch_checkpoint(variables, template_pth, out_pth, norm_fns=None):
    """Write flax variables as a reference-style .pth (requires torch)."""
    import torch
    template = torch.load(template_pth, map_location="cpu",
                          weights_only=True)
    sd = variables_to_torch_statedict(variables, template, norm_fns=norm_fns)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32))) if np.asarray(v).dtype.kind == "f"
        else torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, out_pth)
    return out_pth


def load_torch_checkpoint(path, norm_fns=None):
    """Load a .pth checkpoint file into flax variables (requires torch)."""
    import torch
    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return torch_statedict_to_variables(state_dict, norm_fns=norm_fns)


def main(argv=None):
    """CLI: convert a torch .pth state dict to a flax msgpack checkpoint.

    Usage: python -m mft_tpu.models.raft.convert in.pth out.msgpack
    (tools/download_models.sh documents the full fetch+convert flow).
    """
    import argparse
    from pathlib import Path
    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("src", help="torch .pth checkpoint")
    parser.add_argument("dst", help="output flax .msgpack path")
    args = parser.parse_args(argv)
    from flax import serialization
    variables = load_torch_checkpoint(args.src)
    Path(args.dst).parent.mkdir(parents=True, exist_ok=True)
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
