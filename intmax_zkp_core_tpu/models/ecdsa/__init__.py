from .account import Account as EcdsaAccount, private_key_to_account, pack_signature, unpack_signature  # noqa: F401
