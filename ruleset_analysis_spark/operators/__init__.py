"""Operator modules. Importing ``plans.registry.all_specs`` loads these;
each module registers its queries via ``plans.registry.register``."""
