"""Result sinks beyond files: network socket, results cache.

Reference: the clo/clp-s output-handler plug-ins
(clp/clo/OutputHandler.hpp, clp_s/OutputHandlerImpl.hpp) — stdout,
network socket, MongoDB results cache, reducer. Spark re-expression:
stdout = CLI ``toLocalIterator``; reducer = Spark shuffle (built-in);
network/results-cache live here as ``foreachPartition`` / top-k writers.
"""
