"""Shared test helper: synthesize a torch state_dict from an import mapping.

Used by test_torch_import.py and test_reference_parity.py so the
torch-layout conventions (BN leaf names, OIHW conv kernels, [out, in]
linear weights) live in exactly one place.
"""

import numpy as np
import torch


def fill_synthetic_state_dict(params, mapping, rng):
    """Random torch tensors whose shapes reverse-map onto our params.

    ``mapping``: {torch_prefix: flax param path}.  Paths that don't resolve
    in ``params`` are skipped (lets one mapping serve several model sizes).
    """
    sd = {}
    for torch_prefix, path in mapping.items():
        node = params
        ok = True
        for k in path:
            if k not in node:
                ok = False
                break
            node = node[k]
        if not ok:
            continue
        if 'scale' in node:
            c = node['scale'].shape[0]
            sd[f'{torch_prefix}.weight'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.bias'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.running_mean'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.running_var'] = torch.from_numpy(
                np.abs(rng.randn(c)).astype(np.float32) + 0.5)
        elif 'kernel' in node:
            shp = node['kernel'].shape
            if len(shp) == 4:
                kh, kw, cin, cout = shp
                sd[f'{torch_prefix}.weight'] = torch.from_numpy(
                    rng.randn(cout, cin, kh, kw).astype(np.float32))
            else:
                cin, cout = shp
                sd[f'{torch_prefix}.weight'] = torch.from_numpy(
                    rng.randn(cout, cin).astype(np.float32))
            if 'bias' in node:
                sd[f'{torch_prefix}.bias'] = torch.from_numpy(
                    rng.randn(node['bias'].shape[0]).astype(np.float32))
    return sd
