import torch


def padding(xs):
    lens = torch.tensor([x.shape[-1] for x in xs])
    T = int(lens.max())
    out = torch.zeros(len(xs), xs[0].shape[0] if xs[0].dim() > 1 else T, T)
    for i, x in enumerate(xs):
        out[i, ..., : x.shape[-1]] = x
    return out, lens
