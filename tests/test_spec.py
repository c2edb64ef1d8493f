import pytest

from ecoflap_tpu.core.spec import PruneSpec, format_prune_spec, parse_prune_spec


def test_parse_roundtrip():
    spec = parse_prune_spec("24-0.5-1.0-1.0")
    assert spec == PruneSpec(24, 0.5, 1.0, 1.0)
    assert spec.sparsity == 0.5
    assert format_prune_spec(spec) == "24-0.5-1.0-1.0"


def test_parse_vit_spec():
    spec = parse_prune_spec("39-0.5-1.0-1.0")
    assert spec.num_layers == 39
    assert spec.sparsity == 0.5


def test_reject_bad_specs():
    with pytest.raises(ValueError):
        parse_prune_spec("24-0.5-1.0")
    with pytest.raises(ValueError):
        parse_prune_spec("24-1.5-1.0-1.0")
