from .explain import assert_broadcast_join, assert_pushed_filters, plan_string  # noqa: F401
