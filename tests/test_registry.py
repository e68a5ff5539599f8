import pytest

from bifold_tpu.core import Registry


def test_registry_build_pops_name_and_splats_kwargs():
    reg = Registry("thing")

    @reg.register("widget")
    def make_widget(size, color="red"):
        return (size, color)

    assert "widget" in reg
    assert reg.build({"name": "widget", "size": 3}) == (3, "red")
    assert reg.build({"name": "widget", "size": 3, "color": "blue"}) == (3, "blue")
    # extras win over config keys
    assert reg.build({"name": "widget", "size": 3}, color="green") == (3, "green")


def test_registry_errors():
    reg = Registry("thing")

    @reg.register("a")
    def a():
        return 1

    with pytest.raises(KeyError):
        reg.get("missing")
    with pytest.raises(KeyError):
        reg.build({"no_name": True})
    with pytest.raises(KeyError):

        @reg.register("a")
        def a2():
            return 2
