from . import datatype
from .array import Array, array, nulls, full, row_mask
from .schema import Field, Schema, field, schema
from .batch import Batch, Table, batch, table
from .tensor import (Tensor, SparseCOOTensor, SparseCSRMatrix,
                     SparseCSCMatrix)
