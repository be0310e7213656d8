"""Dataset→Dataset operator stages. Each stage is a function (or callable
actor class) over ``ray.data.Dataset`` with a declared Arrow schema,
composable into pipelines (SURVEY §2.8 rebuild contract)."""
