"""(stub — filled in by later milestone)"""
